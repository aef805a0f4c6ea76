package graft

import graft.SparkEntry.Q
import graft.core.{JTable, Sel}
import graft.operators.{Aggregations => A, Joins, NDSparse, Reshape}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query registry batch 3: scalar-function surface (§2.8), running
  * windows, point lookups, exact quantiles, JSON extraction.
  */
private[graft] object Batch3 {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val queries: Seq[Q] = Seq(

    // §2.2 convertdim on a time dimension: month truncation + agg.
    Q("q47_convertdim_month",
      (s, dir) => {
        val nd = NDSparse(li(s, dir), Seq("l_shipdate"), Seq("l_quantity"))
        nd.convertdim("l_shipdate", d => date_trunc("month", d).cast("date"),
          "n" -> count(lit(1)), "sum_qty" -> dsum(col("l_quantity"))).table.df
          .withColumnRenamed("l_shipdate", "ship_month")
          .orderBy("ship_month")
      },
      Some("""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY 1 ORDER BY ship_month""".stripMargin)),

    // §2.5 running (cumulative) aggregate — decimal accumulation so the
    // frame-evaluation order (sequential vs segment-tree) can't matter.
    Q("q48_window_running",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir)
          .withColumn("running_value",
            sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
          .select(col("event_id"), col("user_id"), col("running_value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
             |FROM events ORDER BY event_id""".stripMargin)),

    // §2.11 flatten of table-valued cells: nest then explode + splat.
    Q("q49_flatten_structs",
      (s, dir) => {
        val nested = Joins_groupNested(s, dir)
        Reshape.flattenStructs(JTable(nested), "items", Seq("o_orderkey"))
          .orderBy("o_orderkey", "l_linenumber")
      },
      Some("""SELECT o_orderkey, l_linenumber, l_quantity
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey <= 200
             |ORDER BY o_orderkey, l_linenumber""".stripMargin)),

    // §2.2 subtable — contiguous row-range by global position, through the
    // library operator (partition-offset zipWithIndex; no single-task
    // global window anywhere in the plan).
    Q("q50_subtable",
      (s, dir) => {
        JTable(Tables.orders(s, dir), Seq("o_orderkey"))
          .subtable(101, 120)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 20 OFFSET 100""".stripMargin)),

    // §2.4 groupby vector fn with oracle: exact interpolating median —
    // identical for integral-valued doubles in both engines.
    Q("q51_median",
      (s, dir) => {
        A.groupby(JTable(li(s, dir)), Seq("l_returnflag"),
          "median_qty" -> percentile(col("l_quantity"), lit(0.5)),
          "n" -> count(lit(1)))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // §2.8 string scalar functions (row-level, engine-portable).
    Q("q52_string_funcs",
      (s, dir) => {
        Tables.part(s, dir)
          .select(col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 8).as("name_prefix"),
            length(col("p_name")).cast("long").as("name_len"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  substring(p_name, 1, 8) AS name_prefix,
             |  CAST(length(p_name) AS BIGINT) AS name_len,
             |  p_brand || '|' || p_type AS brand_type
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // §2.8 date scalar functions.
    Q("q53_date_funcs",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("d"),
            date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
             |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             |  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
             |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // §2.8 JSON-ish extraction from the props column (regex-portable).
    Q("q54_json_extract",
      (s, dir) => {
        ev(s, dir)
          .select(col("event_id"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // §2.4 exact count-distinct per group.
    Q("q55_countdistinct",
      (s, dir) => {
        li(s, dir).groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
             |  COUNT(DISTINCT l_suppkey) AS n_supps
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // §2.7 union-all of disjoint slices (order-preserving merge shape).
    Q("q56_union_all",
      (s, dir) => {
        val a = li(s, dir).filter(col("l_returnflag") === "A")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        val b = li(s, dir).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        a.unionByName(b).orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             |WHERE l_returnflag IN ('A', 'R')
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // §2.4 salted two-phase aggregation — same answer as a plain GROUP BY
    // (the skew path is a pure execution-strategy change).
    Q("q58_salted_agg",
      (s, dir) => {
        A.groupreduceSalted(JTable(li(s, dir)), Seq("l_returnflag"), 16,
          ("n", count(lit(1)), (c: Column) => sum(c)),
          ("sum_qty", sum(col("l_quantity").cast("decimal(18,2)")), (c: Column) => sum(c)),
          ("max_price", max(col("l_extendedprice")), (c: Column) => max(c)))
          .withColumn("sum_qty", col("sum_qty").cast("double"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  MAX(l_extendedprice) AS max_price
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // §2.3 leftjoin with combine op (reference join.jl:192-230).
    Q("q59_leftjoin_combine",
      (s, dir) => {
        val cust = JTable(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_acctbal")))
        val ords = JTable(Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("c_custkey"))
          .agg(max(col("o_totalprice")).as("max_order")))
        Joins.leftjoinWith(cust, ords, Seq("c_custkey"),
          "c_acctbal", "max_order", (l, r) => greatest(l, r), as = "bal_or_best")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN m.max_order IS NOT NULL THEN GREATEST(c_acctbal, m.max_order)
             |       ELSE c_acctbal END AS bal_or_best
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, MAX(o_totalprice) AS max_order FROM orders GROUP BY 1) m
             |  ON c_custkey = m.o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // §2.2 NDSparse scalar getindex — exact point lookup on the pkey.
    Q("q57_nd_point_lookup",
      (s, dir) => {
        val nd = NDSparse(li(s, dir), Seq("l_orderkey", "l_linenumber"),
          Seq("l_quantity", "l_extendedprice"))
        nd.lookup(42L, 1)
      },
      Some("""SELECT l_quantity, l_extendedprice FROM lineitem
             |WHERE l_orderkey = 42 AND l_linenumber = 1""".stripMargin))
  )

  /** Nested orders→items table used by q49 (groupjoin output shape). */
  private def Joins_groupNested(s: SparkSession, dir: String) = {
    val liSmall = li(s, dir).filter(col("l_orderkey") <= 200)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    graft.operators.Joins.groupjoin(
      JTable(Tables.orders(s, dir).filter(col("o_orderkey") <= 200)),
      JTable(liSmall), Seq("o_orderkey"), Seq("l_linenumber", "l_quantity"),
      how = "inner")
      .withColumnRenamed("groups", "items")
      .select(col("o_orderkey"), col("items"))
  }
}
