package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 73 (round 17, wave 5): one-sample t, the
  * distribution-free median CI, Grubbs' outlier statistic, risk
  * difference with the Newcombe interval, and per-group exact MAD.
  */
private[graft] object Batch73 {

  val queries: Seq[Q] = Seq(

    // One-sample t of quantity against the contract value 25.5: exact
    // decimal moments, welch pinned chain.
    Q("q419_one_sample_t",
      (s, dir) => graft.operators.Analytics.oneSampleT(
        Tables.lineitem(s, dir), "l_quantity", mu0 = 25.5),
      Some("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
             |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
             |      CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS ss
             |  FROM lineitem WHERE l_quantity IS NOT NULL),
             |f AS (SELECT n, s / CAST(n AS DOUBLE) AS mean,
             |    CASE WHEN n >= 2 THEN (ss - s * s / CAST(n AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) - 1.0) END AS var
             |  FROM a)
             |SELECT n, mean,
             |  CASE WHEN var >= 0 THEN sqrt(var) END AS sd,
             |  CASE WHEN var > 0 THEN sqrt(var / CAST(n AS DOUBLE)) END AS se,
             |  CASE WHEN var > 0 THEN (mean - 25.5) / sqrt(var / CAST(n AS DOUBLE)) END AS t,
             |  CASE WHEN n >= 2 THEN n - 1 END AS dof
             |FROM f""".stripMargin)),

    // Distribution-free 95% CI for the median price: order-statistic
    // ranks l = floor((n - z*sqrt(n))/2), u = n - l + 1, values by
    // rank containment on the distinct prefix.
    Q("q420_median_ci",
      (s, dir) => graft.operators.Analytics.medianCI(
        Tables.lineitem(s, dir), "l_extendedprice"),
      Some("""WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
             |cum AS (SELECT v, c,
             |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |    SUM(c) OVER () AS n
             |  FROM c),
             |k AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
             |    GREATEST(1, CAST(FLOOR((CAST(MAX(n) AS DOUBLE) -
             |      1.959964 * sqrt(CAST(MAX(n) AS DOUBLE))) / 2.0) AS BIGINT)) AS l,
             |    (CAST(MAX(n) AS DOUBLE) - 1.959964 * sqrt(CAST(MAX(n) AS DOUBLE))) / 2.0 < 1.0 AS clamped
             |  FROM cum),
             |k2 AS (SELECT n, l, LEAST(n, n - l + 1) AS u, clamped FROM k),
             |med AS (SELECT quantile_cont(v, 0.5) AS median
             |  FROM (SELECT v FROM b)),
             |pick AS (SELECT k2.n, k2.l, k2.u, k2.clamped,
             |    MIN(CASE WHEN s < l AND l <= s + c THEN v END) AS ci_lo,
             |    MIN(CASE WHEN s < u AND u <= s + c THEN v END) AS ci_hi
             |  FROM cum, k2 GROUP BY k2.n, k2.l, k2.u, k2.clamped)
             |SELECT pick.n, med.median, pick.ci_lo, pick.ci_hi,
             |  pick.l AS rank_lo, pick.u AS rank_hi, pick.clamped
             |FROM pick, med""".stripMargin)),

    // Grubbs statistic on the event values: exact moments, then the
    // argmax deviation with the deterministic larger-value tie-break.
    Q("q421_grubbs",
      (s, dir) => graft.operators.Analytics.grubbsStat(
        Tables.events(s, dir), "value"),
      Some("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
             |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) *
             |      CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS ss
             |  FROM events WHERE value IS NOT NULL),
             |m AS (SELECT n, s / CAST(n AS DOUBLE) AS mean,
             |    CASE WHEN n >= 2 THEN sqrt(GREATEST(0.0,
             |      (ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))) END AS sd
             |  FROM a),
             |mx AS (SELECT ABS(CAST(value AS DOUBLE) - m.mean) AS dev,
             |    CAST(value AS DOUBLE) AS at_value
             |  FROM events, m WHERE value IS NOT NULL
             |  ORDER BY dev DESC, at_value DESC LIMIT 1)
             |SELECT m.n, m.mean, m.sd,
             |  CASE WHEN m.n >= 3 AND m.sd > 0 THEN mx.dev / m.sd END AS g_stat,
             |  mx.at_value
             |FROM m, mx""".stripMargin)),

    // Risk difference view-vs-click for the high-value rate with the
    // Newcombe hybrid-score interval (Wilson bounds, z = 1.959964).
    Q("q422_risk_diff",
      (s, dir) => graft.operators.Analytics.riskDifference(
        Tables.events(s, dir), "event_type", col("value") > 50.0,
        "view", "click"),
      Some("""WITH a AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN event_type = 'view' AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
             |  FROM events WHERE event_type IN ('view','click')),
             |w AS (SELECT n_a, n_b, x_a, x_b,
             |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
             |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
             |    (CAST(x_a AS DOUBLE) + 1.959964 * 1.959964 / 2) / (CAST(n_a AS DOUBLE) + 1.959964 * 1.959964) AS ca,
             |    1.959964 * sqrt(CAST(x_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - CAST(x_a AS DOUBLE)) / CAST(n_a AS DOUBLE) + 1.959964 * 1.959964 / 4) / (CAST(n_a AS DOUBLE) + 1.959964 * 1.959964) AS ha,
             |    (CAST(x_b AS DOUBLE) + 1.959964 * 1.959964 / 2) / (CAST(n_b AS DOUBLE) + 1.959964 * 1.959964) AS cb,
             |    1.959964 * sqrt(CAST(x_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - CAST(x_b AS DOUBLE)) / CAST(n_b AS DOUBLE) + 1.959964 * 1.959964 / 4) / (CAST(n_b AS DOUBLE) + 1.959964 * 1.959964) AS hb
             |  FROM a)
             |SELECT n_a, n_b, x_a, x_b, p_a, p_b, p_a - p_b AS diff,
             |  p_a - p_b - sqrt((p_a - (ca - ha)) * (p_a - (ca - ha)) +
             |    ((cb + hb) - p_b) * ((cb + hb) - p_b)) AS ci_lo,
             |  p_a - p_b + sqrt(((ca + ha) - p_a) * ((ca + ha) - p_a) +
             |    (p_b - (cb - hb)) * (p_b - (cb - hb))) AS ci_hi
             |FROM w""".stripMargin)),

    // Per-event-type exact MAD: both chained medians on the keyed
    // distributed prefix, per-slice robust scale.
    Q("q423_mad_by",
      (s, dir) => graft.operators.Aggregations.madContBy(
        Tables.events(s, dir), Seq("event_type"), "value")
        .orderBy("event_type"),
      Some("""WITH b AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
             |  FROM events WHERE value IS NOT NULL),
             |med AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             |    quantile_cont(v, 0.5) AS median
             |  FROM b GROUP BY 1),
             |mad AS (SELECT b.g, quantile_cont(ABS(b.v - med.median), 0.5) AS mad
             |  FROM b JOIN med ON b.g = med.g GROUP BY 1)
             |SELECT med.g AS event_type, med.n, med.median, mad.mad,
             |  mad.mad * 1.4826 AS mad_normal
             |FROM med JOIN mad ON med.g = mad.g
             |ORDER BY event_type""".stripMargin))
  )
}
