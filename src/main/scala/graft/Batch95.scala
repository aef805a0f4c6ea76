package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 95 (round 19, continuation wave U): the
  * streaming two-sample confidence sequence — the live lift band
  * completing the windowed always-valid pair.
  */
private[graft] object Batch95 {

  val queries: Seq[Q] = Seq(

    // Streaming two-arm lift band on the q448 fixture (hash-split
    // purchase stream, +20 planted on arm b), split across TWO
    // micro-batches: per-arm exact decimal (N, S) carry and the
    // inverted-mixture radius per closed window, bit-identical to
    // DuckDB's window-prefix replay.
    Q("q486_stream_diff_cs",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val cur = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .select(expr("ts div 1000").as("ts_us"),
            when(graft.functions.Sampling.hashU32(col("event_id"), "m2s") <
              2147483648L, "a").otherwise("b").as("grp"),
            col("value"))
          .withColumn("v", when(col("grp") === "b", col("value") + 20.0)
            .otherwise(col("value")))
        val rows = cur.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
        val dayUs = 86400L * 1000000L
        val mid = (rows.map(_._1).min / dayUs + 14) * dayUs
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, String, Double)](s)
        val out = graft.streaming.Streams.windowedDiffCs(
          ms.toDS().toDF("ts_us", "grp", "value"), "grp", "a", "b",
          sigma2 = 8000.0, tau2 = 400.0, alpha = 0.05,
          watermark = "0 seconds", window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q486_sink").start()
        try {
          ms.addData(rows.filter(_._1 < mid).toSeq)
          q.processAllAvailable()
          ms.addData(rows.filter(_._1 >= mid).toSeq)
          q.processAllAvailable()
          ms.addData((flush, "a", 0.0)); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q486_sink").filter(col("bucket_us") <= maxBucket)
          .orderBy("bucket_us")
      },
      Some("""WITH cur AS (SELECT
             |    (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             |    CASE WHEN CAST('0x' || substr(md5('m2s' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'a' ELSE 'b' END AS arm,
             |    value FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |p AS (SELECT bucket_us, arm,
             |    CASE WHEN arm = 'b' THEN value + 20.0 ELSE value END AS v
             |  FROM cur),
             |wb AS (SELECT bucket_us,
             |    CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a_window,
             |    SUM(CASE WHEN arm = 'a' THEN CAST(v AS DECIMAL(28,12))
             |      ELSE CAST(0 AS DECIMAL(28,12)) END) AS sa,
             |    CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b_window,
             |    SUM(CASE WHEN arm = 'b' THEN CAST(v AS DECIMAL(28,12))
             |      ELSE CAST(0 AS DECIMAL(28,12)) END) AS sb
             |  FROM p GROUP BY 1),
             |cum AS (SELECT bucket_us, n_a_window, n_b_window,
             |    CAST(SUM(n_a_window) OVER w AS BIGINT) AS n_a,
             |    CAST(SUM(n_b_window) OVER w AS BIGINT) AS n_b,
             |    SUM(sa) OVER w AS csa, SUM(sb) OVER w AS csb
             |  FROM wb WINDOW w AS (ORDER BY bucket_us ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT bucket_us, n_a_window, n_b_window, n_a, n_b,
             |    CASE WHEN n_a > 0
             |      THEN CAST(csa AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0
             |      THEN CAST(csb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
             |    END AS vt
             |  FROM cum),
             |r AS (SELECT bucket_us, n_a_window, n_b_window, n_a, n_b,
             |    mean_a, mean_b, mean_a - mean_b AS diff,
             |    CASE WHEN vt IS NOT NULL THEN
             |      SQRT((vt * (vt + 400.0) / 400.0) *
             |        (LN((vt + 400.0) / vt) - 2.0 * LN(0.05)))
             |    END AS radius FROM m)
             |SELECT bucket_us, n_a_window, n_b_window, n_a, n_b,
             |  mean_a, mean_b, diff, radius,
             |  diff - radius AS ci_lo, diff + radius AS ci_hi
             |FROM r ORDER BY bucket_us""".stripMargin))
  )
}
