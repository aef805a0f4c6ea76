package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 88 (round 19, continuation wave M): the
  * streaming confidence-sequence monitor — the live error-bar arm of
  * the always-valid family.
  */
private[graft] object Batch88 {

  val queries: Seq[Q] = Seq(

    // Streaming mean confidence sequence under the q430 MemoryStream
    // discipline, split across TWO micro-batches (the (N, S) state
    // must carry): daily closed windows of the purchase value stream
    // fold through the single-key walk, and every emitted window's
    // (n_total, mean_total, radius, ci) must land bit-identical to
    // DuckDB's batch replay of the same window prefixes.
    Q("q475_stream_mean_cs",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val cur = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(expr("ts div 1000").as("ts_us"), col("value"))
        val rows = cur.collect().map(r => (r.getLong(0), r.getDouble(1)))
        val dayUs = 86400L * 1000000L
        val mid = (rows.map(_._1).max / dayUs / 2) * dayUs
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, Double)](s)
        val out = graft.streaming.Streams.windowedMeanCs(
          ms.toDS().toDF("ts_us", "value"),
          sigma2 = 10000.0, tau2 = 500.0, alpha = 0.05,
          watermark = "0 seconds", window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q475_sink").start()
        try {
          ms.addData(rows.filter(_._1 < mid).toSeq)
          q.processAllAvailable()
          ms.addData(rows.filter(_._1 >= mid).toSeq)
          q.processAllAvailable()
          ms.addData((flush, 0.0)); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q475_sink").filter(col("bucket_us") <= maxBucket)
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
             |    CAST(st AS DOUBLE) / CAST(n_total AS DOUBLE) AS mean_total,
             |    10000.0 / CAST(n_total AS DOUBLE) AS vt
             |  FROM cum),
             |r AS (SELECT bucket_us, n_window, n_total, mean_total,
             |    SQRT((vt * (vt + 500.0) / 500.0) *
             |      (LN((vt + 500.0) / vt) - 2.0 * LN(0.05))) AS radius
             |  FROM m)
             |SELECT bucket_us, n_window, n_total, mean_total, radius,
             |  mean_total - radius AS ci_lo, mean_total + radius AS ci_hi
             |FROM r ORDER BY bucket_us""".stripMargin))
  )
}
