package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Pin ONE physical execution of a DataFrame that several branches of a
  * downstream plan will consume, WITHOUT materializing it to storage.
  *
  * Why it exists (round 15): `Analytics.prefixBefore*` derives
  * `spark_partition_id()` over a range-exchanged frame and consumes the
  * result in two plan branches (the per-slice window and the offset
  * table). When Catalyst plans the shared subtree twice, each instance
  * re-executes the range exchange, and a RangePartitioner samples its
  * bounds per execution — at 50M rows with a complex upstream lineage,
  * AQE's runtime decisions diverged between the two instances and the
  * branches sliced the keys differently (caught live by the operator's
  * range-slice guard). `ReuseExchange` usually dedupes the subtree, but
  * that is an optimizer courtesy, not a contract.
  *
  * `localCheckpoint` fixes it structurally but WRITES the frame to block
  * storage (measured 2.3× on the 50M-distinct percentile stress arm).
  * This bridge instead wraps the frame's already-planned RDD in a new
  * leaf: both consumers then share ONE RDD lineage, so the exchange's
  * map stage runs once and each branch merely re-fetches the same
  * shuffle files — exactly `ReuseExchange`'s economics, with RDD-layer
  * semantics (one `ShuffleDependency`) as the guarantee instead of plan
  * canonicalization. Task retries re-fetch the same shuffle output, so
  * partition membership — and therefore `spark_partition_id()` — is
  * stable across both branches by construction.
  *
  * `LogicalRDD` and `queryExecution.toRdd` are `private[sql]`, hence
  * this file lives in the `org.apache.spark.sql` namespace (the
  * ColumnBridge discipline: the bridges are the only places graft
  * touches non-public Spark API). Construction is LAZY — planning
  * happens here, execution on first action, once. */
object RddShareBridge {
  def sharedExecution(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    val qe = classic.queryExecution
    Dataset.ofRows(spark,
      LogicalRDD(qe.analyzed.output, qe.toRdd)(spark))
  }
}
