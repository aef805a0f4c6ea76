package graft

import graft.SparkEntry.Q
import graft.core.JTable
import graft.operators.{Aggregations => A, Joins}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Query registry batch 4: deeper multi-join analytical shapes (TPC-H-like
  * Q3/Q7/Q18 analogs over the synthetic star schema) — the workload class
  * the engine must sustain at 100 TB: selective dim filters pushed to
  * scans, fact-fact joins, aggregation-then-join-back (HAVING).
  */
private[graft] object Batch4 {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def ord(s: SparkSession, dir: String) = Tables.orders(s, dir)

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val queries: Seq[Q] = Seq(

    // Q3 analog: shipping-priority revenue — selective filters on both
    // sides of a 3-way join, top-10 by revenue.
    Q("q60_shipping_priority",
      (s, dir) => {
        val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = ord(s, dir).filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val l = li(s, dir).filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        j.groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(SparkEntry.fprod4(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |  AND l_shipdate > TIMESTAMP '1997-01-01'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // Q7 analog: volume by (supplier nation, ship year) across the full
    // dim chain — broadcast dims, fact shuffled once for the group.
    Q("q61_nation_volume",
      (s, dir) => {
        val j = li(s, dir)
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        j.groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("ship_year"))
          .agg(SparkEntry.fprod4(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("volume"),
            count(lit(1)).as("n"))
          .orderBy("n_name", "ship_year")
      },
      Some("""SELECT n_name, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS volume,
             |  COUNT(*) AS n
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY 1, 2 ORDER BY n_name, ship_year""".stripMargin)),

    // Q18 analog: large-volume orders — aggregate, HAVING, join back to
    // the dimension rows (semi-join shape on an aggregated key set).
    Q("q62_large_orders",
      (s, dir) => {
        val big = li(s, dir).groupBy(col("l_orderkey"))
          // scale-2 fixed-point path (see functions.FixedPoint: bit-
          // identical to the decimal oracle, long-bounded at 100 TB)
          .agg(graft.functions.FixedPoint.sumFixed(col("l_quantity"), 2).as("total_qty"))
          .filter(col("total_qty") > 150)
        val j = Joins.join(JTable(big), JTable(ord(s, dir)),
          Seq("l_orderkey"), Seq("o_orderkey"))
        j.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, total_qty
             |FROM orders JOIN (
             |  SELECT l_orderkey,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             |  FROM lineitem GROUP BY 1
             |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) t
             |  ON o_orderkey = t.l_orderkey
             |ORDER BY o_orderkey""".stripMargin)),

    // Flagship data-pipeline composition: quality-gate → exact-dedup to
    // representatives → per-language corpus stats. One narrow scan + two
    // small shuffles — the canonical pretraining-corpus curation shape.
    Q("q63_pipeline_curate",
      (s, dir) => {
        import graft.functions.{Dedup, Text}
        // language-agnostic gate (length x punctuation): the stopword factor
        // of the full qualityScore is English-specific and would zero out
        // every non-English doc
        val lenScore = least(length(Text.normalize(col("text"))).cast("double") / 200.0, lit(1.0))
        val docs = Tables.documents(s, dir)
          .withColumn("gate", lenScore * (lit(1.0) - Text.punctRatio(col("text"))))
          .filter(col("gate") >= 0.5)
        val reps = Dedup.exact(docs, "doc_id", "text")
          .select(col("rep_id").as("doc_id"))
        val kept = docs.join(reps, "doc_id")
        kept.groupBy(Text.langId(col("text")).as("pred_lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(Text.tokenCount(col("text"))).as("n_tokens"))
          .orderBy("pred_lang")
      },
      Some {
        def hits(ws: Seq[String]) =
          s"len(list_filter(toks, x -> x IN (${ws.map("'" + _ + "'").mkString(",")})))"
        val Seq(en, de, fr, es) = graft.functions.Text.markerWords.map(m => hits(m._2))
        // oracle notes: (a) toks mirrors Text.tokens' empty-token filter
        // (DuckDB string_split('') is [''], len 1 — Spark's is []);
        // (b) punct guards length 0 like Text.punctRatio (0/0 would be NaN,
        // and DuckDB orders NaN above all values so `gate >= 0.5` would
        // diverge); (c) the token sum is CAST to BIGINT — DuckDB's
        // SUM(BIGINT) is HUGEINT, which the driver's compare widens to
        // float64 ("26646.0" vs Spark's "26646": round-1's one hash miss).
        Some(s"""WITH n AS (SELECT doc_id, text,
                |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents),
                |t AS (SELECT doc_id, text, norm,
                |    list_filter(string_split(norm, ' '), x -> length(x) > 0) AS toks,
                |    CASE WHEN length(norm) > 0
                |      THEN CAST(len(regexp_extract_all(norm, '[.,;:!?''"()-]')) AS DOUBLE) / length(norm)
                |      ELSE 0.0 END AS punct
                |  FROM n),
                |q AS (SELECT *,
                |    LEAST(CAST(length(norm) AS DOUBLE) / 200.0, 1.0) * (1.0 - punct) AS gate
                |  FROM t),
                |gated AS (SELECT * FROM q WHERE gate >= 0.5),
                |reps AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY sha256(norm)),
                |kept AS (SELECT g.* FROM gated g JOIN reps USING (doc_id))
                |SELECT CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
                |       WHEN $es > GREATEST($en, $de, $fr) THEN 'es'
                |       WHEN $fr > GREATEST($en, $de) THEN 'fr'
                |       WHEN $de > $en THEN 'de'
                |       ELSE 'en' END AS pred_lang,
                |  COUNT(*) AS n_docs,
                |  CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
                |FROM kept GROUP BY 1 ORDER BY pred_lang""".stripMargin)
      }.get)
  )
}
