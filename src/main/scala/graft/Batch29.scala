package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 29 (round 11, sixth session, wave 20):
  * seasonal-naive forecast baseline and diff/pct-change.
  */
private[graft] object Batch29 {

  val queries: Seq[Q] = Seq(

    // Seasonal-naive (period 7 days) forecast error on per-user daily
    // purchase totals: the bucket aggregate, the d-7 self-match, the
    // decimal-exact |err| sum, and the division all replayed.
    Q("q221_seasonal_naive",
      (s, dir) => {
        graft.operators.TimeSeries.seasonalNaiveError(
            Tables.events(s, dir).filter(col("event_type") === "purchase"),
            Seq("user_id"), "ts",
            valueCol = sum(col("value").cast("decimal(18,4)")),
            width = 86400000000000L, period = 7L)
          .orderBy("user_id")
      },
      Some("""WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
             |    SUM(CAST(value AS DECIMAL(18,4))) AS v
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT o.user_id, CAST(COUNT(*) AS BIGINT) AS n_eval,
             |  CAST(SUM(ABS(o.v - p.v)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae
             |FROM b o JOIN b p
             |  ON o.user_id = p.user_id AND o.bucket = p.bucket + 7
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // diff / pct_change over each user's purchase sequence: lag, the
    // exact decimal difference, the zero-previous NULL guard, and the
    // pinned division all replayed per row.
    Q("q222_pct_change",
      (s, dir) => {
        graft.operators.TimeSeries.pctChange(
            Tables.events(s, dir).filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("event_id"), col("value")),
            Seq("user_id"), "ts", "value", tieCol = "event_id")
          .select(col("event_id"), col("user_id"), col("diff"), col("pct_change"))
          .orderBy("event_id")
      },
      Some("""WITH w AS (SELECT event_id, user_id,
             |    CAST(value AS DECIMAL(18,4)) AS v,
             |    LAG(CAST(value AS DECIMAL(18,4))) OVER (
             |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
             |  FROM events WHERE event_type = 'purchase')
             |SELECT event_id, user_id,
             |  CAST(v - prev AS DOUBLE) AS diff,
             |  CASE WHEN prev IS NOT NULL AND prev <> 0
             |       THEN CAST(v - prev AS DOUBLE) / CAST(prev AS DOUBLE) END AS pct_change
             |FROM w ORDER BY event_id""".stripMargin))
  )
}
