package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 50 (round 15, session 3): the rolling
  * co-movement monitor. (Funnel and cohort retention already exist —
  * q165/q166, Analytics.funnel/cohortRetention.)
  */
private[graft] object Batch50 {

  val queries: Seq[Q] = Seq(

    // 7-day rolling correlation of daily volume vs daily value mass per
    // event type — the co-movement monitor. Both series are exact
    // decimals (count; per-row decimal(18,6) value sums), so every
    // windowed sufficient statistic replays; the r chain is pinned.
    Q("q325_rolling_corr",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"), expr("ts div 86400000000000").as("day"),
            col("value"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("x"),
            sum(col("value").cast("decimal(18,6)")).as("y"))
        graft.operators.TimeSeries.rollingCorr(daily, Seq("event_type"),
            "day", "x", "y", lookback = 6)
          .withColumn("y", col("y").cast("double"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             |    CAST(COUNT(*) AS BIGINT) AS x,
             |    SUM(CAST(value AS DECIMAL(18,6))) AS y
             |  FROM events GROUP BY 1, 2),
             |w AS (SELECT event_type, day, x, y,
             |    CAST(COUNT(*) OVER win AS BIGINT) AS n_win,
             |    SUM(CAST(x AS DECIMAL(18,6))) OVER win AS sx,
             |    SUM(CAST(y AS DECIMAL(18,6))) OVER win AS sy,
             |    SUM(CAST(CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6)) AS DECIMAL(38,12))) OVER win AS sxx,
             |    SUM(CAST(CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6)) AS DECIMAL(38,12))) OVER win AS syy,
             |    SUM(CAST(CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6)) AS DECIMAL(38,12))) OVER win AS sxy
             |  FROM daily
             |  WINDOW win AS (PARTITION BY event_type ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
             |r AS (SELECT *,
             |    CAST(n_win AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
             |    CAST(n_win AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
             |  FROM w)
             |SELECT event_type, day, x, CAST(y AS DOUBLE) AS y, n_win,
             |  CASE WHEN n_win > 1 AND vx > 0 AND vy > 0
             |    THEN (CAST(n_win AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / (sqrt(vx) * sqrt(vy)) END AS r
             |FROM r ORDER BY event_type, day""".stripMargin)),
  )
}
