package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 40 (round 12): robust trimmed mean and the
  * one-pass column profiler.
  */
private[graft] object Batch40 {

  val queries: Seq[Q] = Seq(

    // 10%-trimmed mean of line-item prices WITHOUT a row sort: the
    // value counts, cumulative ranks, per-value kept weights (partial
    // boundary blocks included), decimal kept-mass sum, and the single
    // division are all replayed.
    Q("q247_trimmed_mean",
      (s, dir) => graft.operators.Aggregations.trimmedMean(
        Tables.lineitem(s, dir), "l_extendedprice", alpha = 0.1),
      Some("""WITH c AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |cum AS (SELECT v, c,
             |  COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER () AS n FROM c),
             |k AS (SELECT CAST(FLOOR(0.1 * CAST(MAX(n) AS DOUBLE)) AS BIGINT) AS k, CAST(MAX(n) AS BIGINT) AS n FROM cum),
             |kept AS (SELECT cum.v,
             |    GREATEST(0, LEAST(cum.s + cum.c, k.n - k.k) - GREATEST(cum.s, k.k)) AS w,
             |    k.n, k.k
             |  FROM cum CROSS JOIN k)
             |SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(n) - 2 * MAX(k) AS BIGINT) AS n_kept,
             |  CAST(SUM(CAST(w AS DECIMAL(19,0)) * v) AS DOUBLE) / CAST(MAX(n) - 2 * MAX(k) AS DOUBLE) AS mean
             |FROM kept WHERE w > 0""".stripMargin)),

    // One-pass profile of the documents table's integer/string columns:
    // counts, null counts, EXACT distincts, and native-ordered min/max
    // (stringified post-aggregation) — every cell replayed per column.
    Q("q248_profile",
      (s, dir) => Diagnostics.profile(Tables.documents(s, dir),
        Seq("doc_id", "lang", "source", "n_chars")),
      Some("""SELECT 'doc_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
             |    CAST(MIN(doc_id) AS VARCHAR) AS min_v, CAST(MAX(doc_id) AS VARCHAR) AS max_v
             |  FROM documents
             |UNION ALL
             |SELECT 'lang', CAST(COUNT(*) AS BIGINT), CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(COUNT(DISTINCT lang) AS BIGINT), CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
             |  FROM documents
             |UNION ALL
             |SELECT 'source', CAST(COUNT(*) AS BIGINT), CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(COUNT(DISTINCT source) AS BIGINT), CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
             |  FROM documents
             |UNION ALL
             |SELECT 'n_chars', CAST(COUNT(*) AS BIGINT), CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(COUNT(DISTINCT n_chars) AS BIGINT), CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
             |  FROM documents
             |ORDER BY col_name""".stripMargin))
  )
}
