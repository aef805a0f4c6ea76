package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 35 (round 12): DP-noised release counts, series
  * autocorrelation, and the Gini inequality summary.
  */
private[graft] object Batch35 {

  val queries: Seq[Q] = Seq(

    // ε-DP Laplace-noised counts per event type (ε = 1): the count, the
    // salt-derived uniform, the sign, and the inverse-CDF noise chain
    // are all replayed bit-for-bit — the deterministic salt is exactly
    // what makes the RELEASE MECHANISM gateable (production passes a
    // secret fresh salt; the arithmetic is identical).
    Q("q236_dp_counts",
      (s, dir) => graft.operators.Analytics.dpNoisyCounts(
          Tables.events(s, dir), Seq("event_type"),
          epsilon = 1.0, salt = "dp")
        .orderBy("event_type"),
      Some("""WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
             |u AS (SELECT event_type, n,
             |    CAST(CAST('0x' || substr(md5('dp' || event_type), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
             |  FROM c)
             |SELECT event_type, n,
             |  CAST(n AS DOUBLE) - (1.0 / 1.0) *
             |    (CASE WHEN u - 0.5 < 0 THEN -1.0 WHEN u - 0.5 > 0 THEN 1.0 ELSE 0.0 END) *
             |    ln(1.0 - 2.0 * abs(u - 0.5)) AS noisy
             |FROM u ORDER BY event_type""".stripMargin)),

    // ACF of the daily purchase-count series at lags 1..7 — the weekly
    // seasonality detector: the series aggregate, the decimal mean, the
    // variance denominator, every lagged product, and the divisions are
    // all replayed.
    Q("q237_acf_daily",
      (s, dir) => {
        val series = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("d"))
          .agg(count(lit(1)).as("c"))
        graft.operators.TimeSeries.acf(series, "d", "c", maxLag = 7)
      },
      Some("""WITH s AS (SELECT (epoch_us(ts) // 86400000000) AS d, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |m AS (SELECT CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean FROM s),
             |den AS (SELECT CAST(SUM(CAST((CAST(c AS DOUBLE) - m.mean) * (CAST(c AS DOUBLE) - m.mean) AS DECIMAL(28,12))) AS DOUBLE) AS den
             |  FROM s CROSS JOIN m),
             |lags AS (SELECT unnest(range(1, 8)) AS lag),
             |num AS (SELECT l.lag,
             |    CAST(SUM(CAST((CAST(a.c AS DOUBLE) - m.mean) * (CAST(b.c AS DOUBLE) - m.mean) AS DECIMAL(28,12))) AS DOUBLE) AS num,
             |    CAST(COUNT(*) AS BIGINT) AS n_pairs
             |  FROM lags l JOIN s a ON TRUE JOIN s b ON b.d = a.d + l.lag CROSS JOIN m
             |  GROUP BY l.lag)
             |SELECT CAST(num.lag AS BIGINT) AS lag, n_pairs,
             |  CASE WHEN den.den > 0 THEN num.num / den.den END AS acf
             |FROM num CROSS JOIN den ORDER BY lag""".stripMargin)),

    // Gini of line-item prices — inequality via the doubled-average-rank
    // identity over DISTINCT values: counts, cumulative ranks, the
    // decimal Σv·c·r2 and Σv·c, and the pinned final chain replayed.
    Q("q238_gini",
      (s, dir) => graft.operators.Analytics.gini(
        Tables.lineitem(s, dir), "l_extendedprice"),
      Some("""WITH c AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1),
             |cum AS (SELECT v, c,
             |  COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b,
             |  SUM(c) OVER () AS n FROM c),
             |agg AS (SELECT MAX(n) AS n,
             |    SUM(CAST(v AS DECIMAL(20,2)) * CAST(c AS DECIMAL(19,0)) * CAST(2 * b + c + 1 AS DECIMAL(19,0))) AS s1,
             |    SUM(CAST(v AS DECIMAL(20,2)) * CAST(c AS DECIMAL(19,0))) AS sv
             |  FROM cum)
             |SELECT CAST(n AS BIGINT) AS n,
             |  CASE WHEN CAST(sv AS DOUBLE) <> 0.0 THEN
             |    (CAST(s1 AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sv AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)) END AS gini
             |FROM agg""".stripMargin))
  )
}
