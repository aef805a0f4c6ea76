package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 23 (round 11, sixth session, wave 14):
  * neighbor aggregation and snapshot time travel.
  */
private[graft] object Batch23 {

  val queries: Seq[Q] = Seq(

    // One-hop neighbor aggregation on the co-purchase graph: per part,
    // exact stats over its co-purchased NEIGHBORS' retail prices — the
    // message-passing feature primitive. The oracle re-derives the
    // normalized symmetric closure and every aggregate.
    Q("q206_neighbor_agg",
      (s, dir) => {
        val e = Tables.coPurchaseEdges(s, dir)
        val attrs = Tables.part(s, dir)
          .select(col("p_partkey"), col("p_retailprice"))
        graft.functions.Graphs.neighborAgg(e, attrs, "p_partkey",
            aggs = Seq(
              "sum_price" -> sum(col("p_retailprice").cast("decimal(18,2)"))
                .cast("double"),
              "min_price" -> min(col("p_retailprice")),
              "max_price" -> max(col("p_retailprice"))))
          .orderBy("node")
      },
      Some("""WITH e0 AS (SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |sym AS (SELECT i AS node, j AS nbr FROM e0
             |  UNION ALL SELECT j AS node, i AS nbr FROM e0)
             |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
             |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  MIN(p_retailprice) AS min_price,
             |  MAX(p_retailprice) AS max_price
             |FROM sym JOIN part ON nbr = p_partkey
             |GROUP BY node ORDER BY node""".stripMargin)),

    // Snapshot time travel: two saves into one versioned table (disjoint
    // order slices), then a time-travel read of v1 AFTER v2 committed —
    // the returned rollup must be exactly the v1 slice (the oracle
    // recomputes it from the raw table), proving the manifest pins the
    // version and later writes are invisible to it. The version/count
    // literals ride the gate so a mis-flipped pointer or a missing
    // manifest fails loudly.
    Q("q207_snapshot_travel",
      (s, dir) => {
        val snapDir = java.nio.file.Files.createTempDirectory("graft-snap-")
          .toAbsolutePath.toString + "/orders_snap"
        val o = Tables.orders(s, dir)
        val v1 = graft.sources.IO.saveSnapshot(
          o.filter(col("o_orderkey") % 3 === 0), snapDir)
        val v2 = graft.sources.IO.saveSnapshot(
          o.filter(col("o_orderkey") % 3 =!= 0), snapDir)
        val versions = graft.sources.IO.snapshotVersions(s, snapDir)
        graft.sources.IO.loadSnapshot(s, snapDir, v1)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("total"))
          .withColumn("version", lit(v1.toLong))
          .withColumn("latest", lit(v2.toLong))
          .withColumn("n_versions", lit(versions.size.toLong))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  CAST(1 AS BIGINT) AS version, CAST(2 AS BIGINT) AS latest,
             |  CAST(2 AS BIGINT) AS n_versions
             |FROM orders WHERE o_orderkey % 3 = 0
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
