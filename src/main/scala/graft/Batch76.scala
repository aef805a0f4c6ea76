package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 76 (round 18, wave 2): Poisson-bootstrap
  * percentile confidence intervals for quantiles — the order-statistic
  * complement of q240's bootstrap means, every replicate riding ONE
  * distributed distinct-value prefix.
  */
private[graft] object Batch76 {

  private def bootstrapOracle(p: String, b: Int, salt: String,
                              ciLo: String, ciHi: String): String =
    s"""WITH reps AS (SELECT unnest(range(0, $b)) AS rep),
       |base AS (SELECT value AS v,
       |    CAST('0x' || substr(md5('$salt' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5('$salt' || CAST(event_id AS VARCHAR)), 9, 8) AS BIGINT) AS h2
       |  FROM events WHERE event_type = 'purchase'
       |    AND value IS NOT NULL AND event_id IS NOT NULL),
       |m0 AS (SELECT reps.rep, base.v,
       |    xor(h1, (h2 + reps.rep * 2654435761) % 4294967296) AS x0
       |  FROM base CROSS JOIN reps),
       |m1 AS (SELECT rep, v, (x0 * 1597334677) % 4294967296 AS x1 FROM m0),
       |m2 AS (SELECT rep, v,
       |    (xor(x1, x1 >> 16) * 887987685) % 4294967296 AS x3 FROM m1),
       |r AS (SELECT rep, v,
       |    CAST(xor(x3, x3 >> 13) AS DOUBLE) / 4294967296.0 AS u FROM m2),
       |w AS (SELECT rep, v, CASE
       |    WHEN u < 0.36787944117144233 THEN 0
       |    WHEN u < 0.7357588823428847 THEN 1
       |    WHEN u < 0.9196986029286058 THEN 2
       |    WHEN u < 0.9810118431238462 THEN 3
       |    WHEN u < 0.9963401531726563 THEN 4
       |    WHEN u < 0.9994058151824183 THEN 5
       |    WHEN u < 0.9999167588507119 THEN 6
       |    WHEN u < 0.9999897508033253 THEN 7
       |    ELSE 8 END AS w FROM r),
       |wa AS (SELECT rep, v, w FROM w
       |  UNION ALL SELECT -1 AS rep, v, 1 AS w FROM base),
       |vc AS (SELECT rep, v, CAST(SUM(w) AS BIGINT) AS c
       |  FROM wa GROUP BY 1, 2),
       |cm AS (SELECT rep, v, SUM(c) OVER
       |    (PARTITION BY rep ORDER BY v ROWS UNBOUNDED PRECEDING) AS incl
       |  FROM vc),
       |tot AS (SELECT rep, CAST(SUM(c) AS BIGINT) AS n FROM vc GROUP BY 1),
       |tgt AS (SELECT rep, n, CASE WHEN n > 0 THEN
       |    CAST(CEIL($p * CAST(n AS DOUBLE)) AS BIGINT) END AS t FROM tot),
       |st AS (SELECT cm.rep,
       |    MIN(CASE WHEN cm.incl >= tgt.t THEN cm.v END) AS stat,
       |    MAX(tgt.n) AS n
       |  FROM cm JOIN tgt ON cm.rep = tgt.rep GROUP BY 1),
       |est AS (SELECT stat AS est, n FROM st WHERE rep = -1),
       |rs AS (SELECT stat FROM st WHERE rep >= 0 AND stat IS NOT NULL),
       |beff AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_eff FROM rs),
       |rc AS (SELECT stat AS sv, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM rs GROUP BY 1),
       |rcum AS (SELECT sv, SUM(c) OVER
       |    (ORDER BY sv ROWS UNBOUNDED PRECEDING) AS incl FROM rc),
       |bounds AS (SELECT
       |    MIN(CASE WHEN rcum.incl >= GREATEST(1,
       |      CAST(CEIL($ciLo * CAST(b_eff AS DOUBLE)) AS BIGINT))
       |      THEN sv END) AS lo,
       |    MIN(CASE WHEN rcum.incl >= GREATEST(1,
       |      CAST(CEIL($ciHi * CAST(b_eff AS DOUBLE)) AS BIGINT))
       |      THEN sv END) AS hi
       |  FROM rcum CROSS JOIN beff)
       |SELECT CAST($p AS DOUBLE) AS p, CAST($b AS BIGINT) AS b,
       |  beff.b_eff, est.n, est.est, bounds.lo, bounds.hi
       |FROM est CROSS JOIN beff CROSS JOIN bounds""".stripMargin

  val queries: Seq[Q] = Seq(

    // Bootstrap median CI on the purchase value stream: 24 replicate
    // Poisson(1) weight columns through ONE distributed value-axis
    // prefix, per-replicate type-1 weighted median via a map-combined
    // min-aggregate, Efron percentile interval over the 24 replicate
    // medians. Every md5 word, mix step, CDF inversion, cumulative,
    // ceil target, and order statistic is replayed by DuckDB.
    Q("q431_bootstrap_median_ci",
      (s, dir) => graft.functions.ML.bootstrapQuantileCI(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        "event_id", "value", p = 0.5, b = 24, salt = "bq"),
      Some(bootstrapOracle("0.5", 24, "bq", "0.025", "0.975"))),

    // The tail quantile (p90) with an independent salt — the CI the
    // latency/length dashboards actually want; same machinery, the
    // replicate draws decorrelated from q431's by the salt.
    Q("q432_bootstrap_p90_ci",
      (s, dir) => graft.functions.ML.bootstrapQuantileCI(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        "event_id", "value", p = 0.9, b = 24, salt = "bq90"),
      Some(bootstrapOracle("0.9", 24, "bq90", "0.025", "0.975")))
  )
}
