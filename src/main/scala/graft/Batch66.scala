package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 66 (round 16, session 2): classical additive
  * seasonal decomposition — the trend/seasonal/residual splitter that
  * should run before changepoint/trend tests on seasonal metrics.
  */
private[graft] object Batch66 {

  val queries: Seq[Q] = Seq(

    // Weekly decomposition of the daily mean-value series: period-7
    // centered MA (equi-join against the offset spine, never a
    // window), phase means of the detrended series re-centered to
    // zero sum, residual - every join and pinned sum replayed.
    Q("q395_seasonal_decompose",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("t"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        graft.operators.TimeSeries.seasonalDecompose(daily, "t", "v",
          period = 7)
      },
      Some("""WITH daily AS (SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS t,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
             |  FROM events GROUP BY 1),
             |spine AS (SELECT unnest(range(-3, 4)) AS off),
             |ma AS (SELECT a.t, CAST(COUNT(*) AS BIGINT) AS kk,
             |    CAST(SUM(CAST((CAST(1 AS DOUBLE) / CAST(7 AS DOUBLE)) * b.v AS DECIMAL(28,12))) AS DOUBLE) AS ma
             |  FROM daily a CROSS JOIN spine sp JOIN daily b ON b.t = a.t + sp.off
             |  GROUP BY a.t),
             |wt AS (SELECT d.t, d.v,
             |    CASE WHEN ma.kk = 7 THEN ma.ma END AS trend,
             |    d.t % 7 AS phase
             |  FROM daily d LEFT JOIN ma ON d.t = ma.t),
             |sraw AS (SELECT phase,
             |    CAST(SUM(CAST(v - trend AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS sraw
             |  FROM wt WHERE trend IS NOT NULL GROUP BY 1),
             |g AS (SELECT CAST(SUM(CAST(sraw AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS g FROM sraw),
             |sea AS (SELECT phase, sraw - g.g AS seasonal FROM sraw, g)
             |SELECT wt.t, wt.v, wt.trend, sea.seasonal,
             |  wt.v - wt.trend - sea.seasonal AS resid
             |FROM wt LEFT JOIN sea ON wt.phase = sea.phase
             |ORDER BY wt.t""".stripMargin))
  )
}
