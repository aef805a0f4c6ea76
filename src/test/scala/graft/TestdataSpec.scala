package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the contract between the driver-regenerated testdata and the
  * query registry — the round-10 incident class.
  *
  * Round 10 regenerated `/root/testdata` with `events.ts` as
  * TIMESTAMP(MICROS) where every earlier generation shipped
  * TIMESTAMP(NANOS); under `nanosAsLong` the nanos shape had arrived as
  * an int64 column, so 7 of 123 queries (every one doing int64-nanos
  * arithmetic on `ts`) failed at analysis and silently vanished from the
  * driver's correctness compare. Two tests prevent a repeat:
  *
  *  1. `Tables.events` normalization is pinned against BOTH physical
  *     shapes, written from scratch — the fix keeps working even after
  *     the next regeneration flips the type back.
  *  2. The Spark-side schema of every testdata table is asserted
  *     verbatim, so ANY generator drift fails here with a message naming
  *     the table and column instead of surfacing as an analysis error
  *     five layers into a query.
  */
class TestdataSpec extends SparkSpec {

  test("Tables.events: ts normalized to int64 nanos from micros-timestamp, utc-timestamp, and long shapes") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ts_shapes").toString
    // 2024-01-02T03:04:05.123456Z — micro precision exercises the *1000.
    val wallMicros = java.time.LocalDateTime
      .parse("2024-01-02T03:04:05.123456")
      .toInstant(java.time.ZoneOffset.UTC)
      .let(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)

    // Shape 1: TIMESTAMP_NTZ (what Spark reads from the round-10+
    // pandas-written timestamp[us] with isAdjustedToUTC=false).
    spark.sql(
      """SELECT 1L AS event_id, TIMESTAMP_NTZ'2024-01-02 03:04:05.123456' AS ts,
        |  7L AS user_id, 'click' AS event_type, 1.5D AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")
    // Shape 2: TIMESTAMP (tz-adjusted; covers the TimestampType branch —
    // written as INT96 under Spark's default outputTimestampType).
    spark.sql(
      """SELECT 1L AS event_id, TIMESTAMP'2024-01-02 03:04:05.123456+00:00' AS ts,
        |  7L AS user_id, 'click' AS event_type, 1.5D AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$base/tz/events.parquet")
    // Shape 3: already-long nanos (the pre-round-10 nanosAsLong arrival).
    Seq((1L, wallMicros * 1000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/long/events.parquet")

    for (shape <- Seq("ntz", "tz", "long")) {
      val ev = Tables.events(spark, s"$base/$shape")
      assert(ev.schema("ts").dataType == LongType, s"shape=$shape")
      val ns = ev.select(col("ts")).as[Long].head()
      assert(ns == wallMicros * 1000L,
        s"shape=$shape: ts=$ns, expected ${wallMicros * 1000L}")
      // column position preserved (queries select events columns by order
      // in a few fixture builders)
      assert(ev.columns.toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"), s"shape=$shape")
    }
  }

  test("Tables.events refuses an unknown ts type loudly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ts_bad").toString
    Seq((1L, "not-a-time")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, base))
    assert(e.getMessage.contains("events.ts"))
  }

  test("testdata schema tripwire: Spark-side types of every table, verbatim") {
    // Expected as of the round-10 regeneration (timestamp[us] era). If the
    // generator drifts again this failure names the exact table/column —
    // fix Tables.scala (a normalization choke point like events.ts), not
    // the 123 queries downstream.
    val expected = Map(
      "region" -> "r_regionkey:int,r_name:string",
      "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
      "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
      "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
      "part" -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
      "orders" -> "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string",
      "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz"),
      // events via Tables.events — POST-normalization (ts MUST be bigint
      // nanos whatever the file carries; that is the whole contract)
      "events" -> "event_id:bigint,ts:bigint,user_id:bigint,event_type:string,value:double,props:string",
      "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
      "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int"
    )
    for (t <- Tables.all) {
      val df = if (t == "events") Tables.events(spark, sf) else Tables.load(spark, sf, t)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      assert(got == expected(t),
        s"\ntestdata drift in table '$t':\n  got      $got\n  expected ${expected(t)}")
    }
  }

  /** Tiny `let` to keep the instant→micros computation single-expression. */
  private implicit class Let[A](private val a: A) {
    def let[B](f: A => B): B = f(a)
  }
}
