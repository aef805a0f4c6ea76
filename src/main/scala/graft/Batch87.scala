package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 87 (round 19, continuation wave L): Theil–Sen
  * robust trend estimation — the slope/intercept companion of the
  * Mann–Kendall direction test.
  */
private[graft] object Batch87 {

  val queries: Seq[Q] = Seq(

    // Sen's slope + Conover intercept on the daily mean purchase value
    // (30 points, 435 pairs — the bounded trend grain the operator's
    // contract prescribes): the pairwise slope multiset, both type-7
    // rank-interpolated medians, and the broadcast slope feeding the
    // residual median are replayed by DuckDB ROW_NUMBER rank picks.
    Q("q474_theil_sen",
      (s, dir) => graft.operators.Analytics.theilSenSlope(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .groupBy(expr("ts div 86400000000000").cast("double").as("t"))
          .agg((sum(col("value").cast("decimal(28,12)")).cast("double") /
            count(lit(1)).cast("double")).as("v")),
        "t", "v"),
      Some("""WITH pts AS (SELECT
             |    CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS t,
             |    CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)
             |      / CAST(COUNT(*) AS DOUBLE) AS v
             |  FROM events WHERE event_type = 'purchase'
             |    AND value IS NOT NULL
             |  GROUP BY 1),
             |ps AS (SELECT (b.v - a.v) / (b.t - a.t) AS sl
             |  FROM pts a, pts b WHERE a.t < b.t),
             |o AS (SELECT sl,
             |    CAST(ROW_NUMBER() OVER (ORDER BY sl) AS BIGINT) - 1 AS r,
             |    CAST(COUNT(*) OVER () AS BIGINT) AS np FROM ps),
             |msl AS (SELECT
             |    MIN(CASE WHEN r = CAST(FLOOR((CAST(np AS DOUBLE) - 1.0) / 2.0) AS BIGINT)
             |      THEN sl END) AS lo,
             |    MIN(CASE WHEN r = LEAST(CAST(FLOOR((CAST(np AS DOUBLE) - 1.0) / 2.0) AS BIGINT) + 1, np - 1)
             |      THEN sl END) AS hi,
             |    MIN((CAST(np AS DOUBLE) - 1.0) / 2.0
             |      - FLOOR((CAST(np AS DOUBLE) - 1.0) / 2.0)) AS frac,
             |    MIN(np) AS np FROM o),
             |sl AS (SELECT lo + frac * (hi - lo) AS slope, np FROM msl),
             |res AS (SELECT p.v - s.slope * p.t AS rv FROM pts p, sl s),
             |o2 AS (SELECT rv,
             |    CAST(ROW_NUMBER() OVER (ORDER BY rv) AS BIGINT) - 1 AS r,
             |    CAST(COUNT(*) OVER () AS BIGINT) AS nn FROM res),
             |mi AS (SELECT
             |    MIN(CASE WHEN r = CAST(FLOOR((CAST(nn AS DOUBLE) - 1.0) / 2.0) AS BIGINT)
             |      THEN rv END) AS lo,
             |    MIN(CASE WHEN r = LEAST(CAST(FLOOR((CAST(nn AS DOUBLE) - 1.0) / 2.0) AS BIGINT) + 1, nn - 1)
             |      THEN rv END) AS hi,
             |    MIN((CAST(nn AS DOUBLE) - 1.0) / 2.0
             |      - FLOOR((CAST(nn AS DOUBLE) - 1.0) / 2.0)) AS frac,
             |    MIN(nn) AS nn FROM o2)
             |SELECT (SELECT nn FROM mi) AS n,
             |  (SELECT np FROM sl) AS n_pairs,
             |  (SELECT slope FROM sl) AS slope,
             |  lo + frac * (hi - lo) AS intercept
             |FROM mi""".stripMargin))
  )
}
