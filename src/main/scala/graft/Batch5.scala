package graft

import graft.SparkEntry.Q
import graft.core.JTable
import graft.operators.{Joins, NDSparse}
import graft.functions.{Similarity, Sketches}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Query registry batch 5 (round 3): full-outer join, convertdim vecagg,
  * OnlineStats combinators, and the LSH-prefiltered near-dup-pairs scale
  * path — each closing a carried coverage gap with a green oracle row.
  */
private[graft] object Batch5 {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def ord(s: SparkSession, dir: String) = Tables.orders(s, dir)

  val queries: Seq[Q] = Seq(

    // §2.3 join how=:outer — full outer with missing-fill on BOTH sides
    // (reference `test/test_join.jl:61-90`): customers with a very large
    // order vs customers with a very small one; most keys appear on only
    // one side, so both null-fill directions are exercised.
    Q("q64_join_outer",
      (s, dir) => {
        val big = JTable(ord(s, dir).filter(col("o_totalprice") > 350000)
          .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_big")))
        val small = JTable(ord(s, dir).filter(col("o_totalprice") < 20000)
          .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_small")))
        Joins.join(big, small, Seq("custkey"), Seq("custkey"), how = "outer")
          .orderBy("custkey")
      },
      Some("""SELECT COALESCE(a.custkey, b.custkey) AS custkey, a.n_big, b.n_small
             |FROM (SELECT o_custkey AS custkey, COUNT(*) AS n_big FROM orders
             |      WHERE o_totalprice > 350000 GROUP BY 1) a
             |FULL JOIN (SELECT o_custkey AS custkey, COUNT(*) AS n_small FROM orders
             |      WHERE o_totalprice < 20000 GROUP BY 1) b
             |  ON a.custkey = b.custkey
             |ORDER BY custkey""".stripMargin)),

    // §2.2 convertdim vecagg form (reference `src/selection.jl:36-47`):
    // collisions merged by a VECTOR aggregate — exact interpolating median
    // of each month's quantities (integral-valued doubles: both engines'
    // interpolation is exact, same precedent as q51).
    Q("q65_convertdim_vecagg",
      (s, dir) => {
        val median: Column => Column =
          graft.operators.Aggregations.medianCol(_, assumeSorted = true)
        val nd = NDSparse(li(s, dir), Seq("l_shipdate"), Seq("l_quantity"))
        nd.convertdimVec("l_shipdate", d => date_trunc("month", d).cast("date"),
            "l_quantity", median, as = "median_qty").table.df
          .withColumnRenamed("l_shipdate", "ship_month")
          .orderBy("ship_month")
      },
      Some("""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
             |  quantile_cont(l_quantity, 0.5) AS median_qty
             |FROM lineitem GROUP BY 1 ORDER BY ship_month""".stripMargin)),

    // §2.4 OnlineStats combinators — Series (N stats, one selection) +
    // Group (per-column stats) fit in ONE aggregation pass / one Exchange.
    Q("q66_series_combinators",
      (s, dir) => {
        import Sketches.Combinators._
        val cols = series(col("l_quantity"),
          "n" -> (c => count(c)),
          "mean_qty" -> (c => sum(c.cast("decimal(18,2)")).cast("double") / count(c)),
          "min_qty" -> (c => min(c)),
          "max_qty" -> (c => max(c))) ++
          group(col("l_extendedprice") -> ("max_price", (c: Column) => max(c)),
            col("l_discount") -> ("min_disc", (c: Column) => min(c)))
        reduceAll(li(s, dir), Seq("l_returnflag"), cols).orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(l_quantity) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS mean_qty,
             |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             |  MAX(l_extendedprice) AS max_price, MIN(l_discount) AS min_disc
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Embedding near-dup pairs through the SCALE operator: LSH bucket
    // prefilter + exact decimal re-check — same oracle as q36's all-pairs
    // SQL (full recall at this threshold/fixture is what the gate checks);
    // the plan's only joins are keyed on (table, signature) buckets, never
    // on vector position.
    Q("q67_embed_pairs_lsh",
      (s, dir) => {
        Similarity.cosinePairsLSH(
          Tables.embeddings(s, dir).filter(col("label") === 0),
          "vec_id", "embedding", threshold = 0.25, dim = 64)
          .orderBy("i", "j")
      },
      Some("""WITH e AS (SELECT vec_id AS id,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings WHERE label = 0),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm FROM e GROUP BY 1),
             |dots AS (SELECT a.id AS i, b.id AS j, SUM(a.vd * b.vd) AS dotd
             |  FROM e a JOIN e b ON a.pos = b.pos AND a.id < b.id GROUP BY 1, 2)
             |SELECT i, j, CAST(dotd AS DOUBLE) / (ni.nrm * nj.nrm) AS cos
             |FROM dots JOIN norms ni ON ni.id = i JOIN norms nj ON nj.id = j
             |WHERE CAST(dotd AS DOUBLE) / (ni.nrm * nj.nrm) >= 0.25
             |ORDER BY i, j""".stripMargin)),

    // OnlineStats Hist THROUGH the mergeable Aggregator (q40 covers the
    // groupBy lowering; this row covers Sketches.HistAgg itself): counts
    // are exact longs, so partial-merge order can't affect the hash. The
    // oracle mirrors the sketch's bin arithmetic ((x-lo)/(hi-lo)*nbins,
    // clamped) rather than an equivalent-looking /width form, so both
    // engines round identically at bin boundaries.
    Q("q68_hist_sketch",
      (s, dir) => {
        val h = Tables.orders(s, dir)
          .agg(Sketches.histCol(0.0, 600000.0, 12)(col("o_totalprice")).as("h"))
        h.select(posexplode(col("h")).as(Seq("bin", "n")))
          .withColumn("bin", col("bin").cast("long"))
          .orderBy("bin")
      },
      Some("""WITH c AS (SELECT LEAST(GREATEST(
             |      CAST(FLOOR(o_totalprice / 600000.0 * 12) AS BIGINT), 0), 11) AS bin,
             |    COUNT(*) AS n
             |  FROM orders GROUP BY 1)
             |SELECT r.bin, COALESCE(c.n, 0) AS n
             |FROM (SELECT unnest(range(12)) AS bin) r
             |LEFT JOIN c USING (bin) ORDER BY bin""".stripMargin)),

    // OnlineStats CountMap THROUGH the Aggregator (exact while distinct
    // keys ≤ maxKeys; q41 covers the groupBy form).
    Q("q69_countmap_sketch",
      (s, dir) => {
        Tables.events(s, dir)
          .agg(Sketches.countmapCol(1000)(col("event_type")).as("m"))
          .select(explode(col("m")).as(Seq("event_type", "n")))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n FROM events
             |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // OnlineStats Mosaic (2-D countmap) THROUGH the Aggregator.
    Q("q70_mosaic_sketch",
      (s, dir) => {
        val ub = concat(lit("u"), pmod(col("user_id"), lit(4L)))
        Tables.events(s, dir)
          .agg(Sketches.mosaicCol(1000)(col("event_type"), ub).as("m"))
          .select(explode(col("m")).as(Seq("k", "n")))
          .select(split(col("k"), Sketches.MosaicAgg.Sep).getItem(0).as("event_type"),
            split(col("k"), Sketches.MosaicAgg.Sep).getItem(1).as("user_bucket"),
            col("n"))
          .orderBy("event_type", "user_bucket")
      },
      Some("""SELECT event_type, 'u' || CAST(user_id % 4 AS VARCHAR) AS user_bucket,
             |  COUNT(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY event_type, user_bucket""".stripMargin)),

    // §2.2 dropmissing on join-produced missings (reference
    // `test/test_table.jl:203-222`): left join creates the nulls, the
    // operator narrows them away — equivalent to the inner join.
    Q("q71_dropmissing",
      (s, dir) => {
        val stats = ord(s, dir).filter(col("o_totalprice") > 300000)
          .groupBy(col("o_custkey").as("c_custkey"))
          .agg(max(col("o_totalprice")).as("max_big"))
        val j = Joins.join(
          JTable(Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"))),
          JTable(stats), Seq("c_custkey"), Seq("c_custkey"), how = "left")
        JTable(j).dropmissing("max_big").df.orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, m.max_big
             |FROM customer JOIN (
             |  SELECT o_custkey, MAX(o_totalprice) AS max_big FROM orders
             |  WHERE o_totalprice > 300000 GROUP BY 1) m
             |  ON c_custkey = m.o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // §2.2 rename (pkey-aware) + positional insertcols through the oracle.
    Q("q72_rename_insert",
      (s, dir) => {
        JTable(Tables.part(s, dir).select(col("p_partkey"), col("p_name")), Seq("p_partkey"))
          .rename("p_name" -> "part_name")
          .insertAfter("p_partkey", "key2" -> (col("p_partkey") * 2).cast("long"))
          .df.orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, CAST(p_partkey * 2 AS BIGINT) AS key2,
             |  p_name AS part_name
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // TPC-H Q5 analog: local-supply revenue per nation inside one region —
    // the 6-way join shape. Fact tables SMJ on their keys; supplier,
    // nation, region broadcast; the c_nationkey = s_nationkey local-supply
    // predicate rides the join.
    Q("q73_local_supply",
      (s, dir) => {
        val j = li(s, dir)
          .join(ord(s, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
        j.groupBy("n_name")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA' AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // TPC-H Q10 analog: top returned-revenue customers (agg → global
    // top-k; TakeOrdered plan, no full sort).
    Q("q74_returned_revenue",
      (s, dir) => {
        val j = li(s, dir).filter(col("l_returnflag") === "R")
          .join(ord(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        j.groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE l_returnflag = 'R'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin)),

    // TPC-H Q12 analog: conditional aggregation (CASE inside SUM) — high-
    // vs low-priority line counts per linestatus.
    Q("q75_priority_split",
      (s, dir) => {
        val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li(s, dir).join(ord(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_count"),
            sum(when(!isHigh, 1L).otherwise(0L)).as("low_count"))
          .orderBy("l_linestatus")
      },
      // CAST to BIGINT: DuckDB's SUM(INTEGER) is HUGEINT (the q63 trap)
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // §2.11 mapslices through the OPAQUE typed path (flatMapGroups): the
    // slice function sees each order's rows as a vector and returns a
    // table — per-line share of the slice's max quantity. Row-level double
    // division is IEEE-identical across engines.
    Q("q76_mapslices",
      (s, dir) => {
        val session = s
        import session.implicits._
        val ds = li(s, dir).filter(col("l_orderkey") <= 500)
          .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
            col("l_quantity").cast("double"))
          .as[(Long, Long, Double)]
        graft.operators.TypedOps
          .mapslices(ds, (t: (Long, Long, Double)) => t._1) { (k, rows) =>
            val mx = rows.map(_._3).max
            rows.map(r => (k, r._2, r._3 / mx))
          }
          .toDF("l_orderkey", "l_linenumber", "qty_share")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  l_quantity / MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS qty_share
             |FROM lineitem WHERE l_orderkey <= 500
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // §2.6 permutedims + leading-dim slice: reorder the NDSparse index so
    // the sliced dim leads. The reference re-sorts; here the pkey re-keys,
    // which changes the RANGE PARTITIONING downstream operators reuse (the
    // shuffle-reuse invariant) — not the parquet layout. Storage-level skip
    // for the sliced dim comes from the pushed `l_linenumber = 7` predicate
    // + row-group min/max stats, which depend on how the data was WRITTEN;
    // the CoreSpec pins that the predicate reaches PushedFilters.
    Q("q77_permutedims_slice",
      (s, dir) => {
        val nd = NDSparse(li(s, dir), Seq("l_orderkey", "l_linenumber"), Seq("l_quantity"))
        nd.permutedims(Seq(1, 0)).slice("l_linenumber" -> 7)
          .table.df
          .select(col("l_linenumber"), col("l_orderkey"), col("l_quantity"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_linenumber, l_orderkey, l_quantity FROM lineitem
             |WHERE l_linenumber = 7 ORDER BY l_orderkey""".stripMargin))
  )
}
