package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 75 (round 18, wave 1): always-valid sequential
  * testing — the mSPRT e-process for a mean stream, its proportion
  * form, and the streaming closed-window monitor arm.
  */
private[graft] object Batch75 {

  val queries: Seq[Q] = Seq(

    // mSPRT mean-shift e-process over a deterministic doc-id-ordered
    // value stream whose mean jumps by +2.0 from doc_id 3000 on: the
    // exact decimal(38,12) inclusive prefix sum (distributed prefix,
    // never a single-task window), the per-row pinned double chain
    // (mixture-variance ratio + quadratic term), and the ln(1/alpha)
    // crossing flag are all replayed row-for-row by DuckDB's window
    // cumulative.
    Q("q428_msprt_mean",
      (s, dir) => graft.operators.Analytics.msprtMeanTest(
        Tables.documents(s, dir).select(
          col("doc_id").as("t"),
          (pmod(col("doc_id") * 2654435761L, lit(1000L)).cast("double") /
            lit(100.0) +
            when(col("doc_id") >= 3000, lit(2.0)).otherwise(lit(0.0)))
            .as("v")),
        "t", "v", mu0 = 5.0, sigma2 = 8.0, tau2 = 0.5, alpha = 0.05),
      Some("""WITH b AS (SELECT doc_id AS t,
             |    CAST((doc_id * 2654435761) % 1000 AS DOUBLE) / 100.0
             |      + CASE WHEN doc_id >= 3000 THEN 2.0 ELSE 0.0 END AS v
             |  FROM documents),
             |c AS (SELECT t,
             |    CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS n,
             |    SUM(CAST(v AS DECIMAL(38,12))) OVER
             |      (ORDER BY t ROWS UNBOUNDED PRECEDING) AS s
             |  FROM b),
             |m AS (SELECT t, n,
             |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v FROM c),
             |e AS (SELECT t, n, mean_v,
             |    0.5 * LN(8.0 / (8.0 + CAST(n AS DOUBLE) * 0.5))
             |      + (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 0.5 *
             |          ((mean_v - 5.0) * (mean_v - 5.0)))
             |        / (2.0 * 8.0 * (8.0 + CAST(n AS DOUBLE) * 0.5)) AS e_log
             |  FROM m)
             |SELECT t, n, mean_v, e_log, e_log >= LN(1.0 / 0.05) AS crossed
             |FROM e ORDER BY t""".stripMargin)),

    // mSPRT proportion form (the conversion-rate monitor): a 52%
    // deterministic success stream tested against p0 = 0.5 via the
    // null-variance Gaussian approximation sigma2 = p0(1-p0) = 0.25 —
    // the delegate wires the variance, the oracle replays it as a
    // literal.
    Q("q429_msprt_proportion",
      (s, dir) => graft.operators.Analytics.msprtProportionTest(
        Tables.documents(s, dir).select(
          col("doc_id").as("t"),
          (pmod(col("doc_id") * 2654435761L, lit(1000L)) < 520)
            .cast("int").as("succ")),
        "t", "succ", p0 = 0.5, tau2 = 0.1, alpha = 0.05),
      Some("""WITH b AS (SELECT doc_id AS t,
             |    CASE WHEN (doc_id * 2654435761) % 1000 < 520
             |      THEN 1.0 ELSE 0.0 END AS v
             |  FROM documents),
             |c AS (SELECT t,
             |    CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS n,
             |    SUM(CAST(v AS DECIMAL(38,12))) OVER
             |      (ORDER BY t ROWS UNBOUNDED PRECEDING) AS s
             |  FROM b),
             |m AS (SELECT t, n,
             |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v FROM c),
             |e AS (SELECT t, n, mean_v,
             |    0.5 * LN(0.25 / (0.25 + CAST(n AS DOUBLE) * 0.1))
             |      + (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 0.1 *
             |          ((mean_v - 0.5) * (mean_v - 0.5)))
             |        / (2.0 * 0.25 * (0.25 + CAST(n AS DOUBLE) * 0.1)) AS e_log
             |  FROM m)
             |SELECT t, n, mean_v, e_log, e_log >= LN(1.0 / 0.05) AS crossed
             |FROM e ORDER BY t""".stripMargin)),

    // Streaming mSPRT monitor under the q232 MemoryStream discipline:
    // daily closed windows of the purchase value stream fold through
    // the single-key sequential state (exact decimal cumulative sum),
    // and every emitted window's (n_total, mean_total, e_log, crossed)
    // must land bit-identical to DuckDB's batch replay of the same
    // window prefix points.
    Q("q430_stream_msprt",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val cur = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(expr("ts div 1000").as("ts_us"), col("value"))
        val rows = cur.collect().map(r => (r.getLong(0), r.getDouble(1)))
        val dayUs = 86400L * 1000000L
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, Double)](s)
        val out = graft.streaming.Streams.windowedMsprt(
          ms.toDS().toDF("ts_us", "value"),
          mu0 = 200.0, sigma2 = 10000.0, tau2 = 500.0, alpha = 0.05,
          watermark = "0 seconds", window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q430_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData((flush, 0.0)); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q430_sink").filter(col("bucket_us") <= maxBucket)
          .orderBy("bucket_us")
      },
      Some("""WITH cur AS (SELECT
             |    (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             |    value AS v FROM events WHERE event_type = 'purchase'),
             |wb AS (SELECT bucket_us, CAST(COUNT(*) AS BIGINT) AS n_window,
             |    SUM(CAST(v AS DECIMAL(28,12))) AS s
             |  FROM cur GROUP BY 1),
             |cum AS (SELECT bucket_us, n_window,
             |    CAST(SUM(n_window) OVER
             |      (ORDER BY bucket_us ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS n_total,
             |    SUM(s) OVER (ORDER BY bucket_us ROWS UNBOUNDED PRECEDING)
             |      AS st
             |  FROM wb),
             |m AS (SELECT bucket_us, n_window, n_total,
             |    CAST(st AS DOUBLE) / CAST(n_total AS DOUBLE) AS mean_total
             |  FROM cum),
             |e AS (SELECT bucket_us, n_window, n_total, mean_total,
             |    0.5 * LN(10000.0 / (10000.0 + CAST(n_total AS DOUBLE) * 500.0))
             |      + (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * 500.0 *
             |          ((mean_total - 200.0) * (mean_total - 200.0)))
             |        / (2.0 * 10000.0 *
             |           (10000.0 + CAST(n_total AS DOUBLE) * 500.0)) AS e_log
             |  FROM m)
             |SELECT bucket_us, n_window, n_total, mean_total, e_log,
             |  e_log >= LN(1.0 / 0.05) AS crossed
             |FROM e ORDER BY bucket_us""".stripMargin))
  )
}
