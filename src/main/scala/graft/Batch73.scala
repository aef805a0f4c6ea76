package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 73 (round 17, waves 5–6): one-sample t, the
  * distribution-free median CI, Grubbs' outlier statistic, risk
  * difference with the Newcombe interval, per-group exact MAD, and
  * the k-sample Anderson–Darling drift gate.
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
             |ORDER BY event_type""".stripMargin)),

    // k-sample Anderson-Darling across the three event types: the
    // midrank A2akN over the distinct pooled values (3-weight prefix)
    // plus the paper's exact 4-moment standardization (h and g
    // harmonic constants over a ROW_NUMBER spine).
    Q("q424_ad_ksample",
      (s, dir) => graft.operators.Analytics.adKSample(
        Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase")),
      Some("""WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
             |  FROM events WHERE event_type IN ('view','click','purchase')
             |    AND value IS NOT NULL),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
             |  FROM base GROUP BY v),
             |cum AS (SELECT v, c0, c1, c2,
             |    COALESCE(SUM(c0) OVER w, 0) AS b0,
             |    COALESCE(SUM(c1) OVER w, 0) AS b1,
             |    COALESCE(SUM(c2) OVER w, 0) AS b2,
             |    SUM(c0) OVER () AS n0, SUM(c1) OVER () AS n1,
             |    SUM(c2) OVER () AS n2
             |  FROM c WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |t AS (SELECT v,
             |    c0 + c1 + c2 AS lj, n0, n1, n2, n0 + n1 + n2 AS nn,
             |    CAST(b0 + b1 + b2 AS DOUBLE) + CAST(c0 + c1 + c2 AS DOUBLE) / 2.0 AS bj,
             |    CAST(b0 AS DOUBLE) + CAST(c0 AS DOUBLE) / 2.0 AS m0,
             |    CAST(b1 AS DOUBLE) + CAST(c1 AS DOUBLE) / 2.0 AS m1,
             |    CAST(b2 AS DOUBLE) + CAST(c2 AS DOUBLE) / 2.0 AS m2
             |  FROM cum),
             |terms AS (SELECT nn, n0, n1, n2,
             |    CASE WHEN bj * (CAST(nn AS DOUBLE) - bj) - CAST(nn AS DOUBLE) * CAST(lj AS DOUBLE) / 4.0 > 0
             |      THEN CAST(lj AS DOUBLE) * (
             |        (CASE WHEN n0 > 0 THEN (CAST(nn AS DOUBLE) * m0 - CAST(n0 AS DOUBLE) * bj) * (CAST(nn AS DOUBLE) * m0 - CAST(n0 AS DOUBLE) * bj) / CAST(n0 AS DOUBLE) ELSE 0.0 END) +
             |        (CASE WHEN n1 > 0 THEN (CAST(nn AS DOUBLE) * m1 - CAST(n1 AS DOUBLE) * bj) * (CAST(nn AS DOUBLE) * m1 - CAST(n1 AS DOUBLE) * bj) / CAST(n1 AS DOUBLE) ELSE 0.0 END) +
             |        (CASE WHEN n2 > 0 THEN (CAST(nn AS DOUBLE) * m2 - CAST(n2 AS DOUBLE) * bj) * (CAST(nn AS DOUBLE) * m2 - CAST(n2 AS DOUBLE) * bj) / CAST(n2 AS DOUBLE) ELSE 0.0 END))
             |        / (bj * (CAST(nn AS DOUBLE) - bj) - CAST(nn AS DOUBLE) * CAST(lj AS DOUBLE) / 4.0)
             |      ELSE 0.0 END AS term
             |  FROM t),
             |main AS (SELECT CAST(MAX(nn) AS BIGINT) AS n,
             |    CAST(MAX(n0) AS BIGINT) AS n0, CAST(MAX(n1) AS BIGINT) AS n1,
             |    CAST(MAX(n2) AS BIGINT) AS n2,
             |    CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS s
             |  FROM terms),
             |a2 AS (SELECT n, n0, n1, n2,
             |    (CAST(n AS DOUBLE) - 1.0) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * s AS a2akn
             |  FROM main),
             |spine AS (SELECT ROW_NUMBER() OVER () AS i FROM base),
             |sp AS (SELECT i FROM spine, a2 WHERE i <= a2.n - 1),
             |h AS (SELECT CAST(SUM(CAST(1.0 / CAST(i AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS h FROM sp),
             |hcum AS (SELECT i,
             |    COALESCE(SUM(CAST(1.0 / CAST(i AS DOUBLE) AS DECIMAL(38,18))) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS hb
             |  FROM sp),
             |g AS (SELECT CAST(SUM(CAST(
             |    (h.h - (CAST(hb AS DOUBLE) + 1.0 / CAST(i AS DOUBLE))) /
             |      (CAST(a2.n AS DOUBLE) - CAST(i AS DOUBLE))
             |    AS DECIMAL(38,18))) AS DOUBLE) AS g
             |  FROM hcum, h, a2 WHERE i <= a2.n - 2),
             |mm AS (SELECT a2.n, a2.a2akn,
             |    1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE) AS hc,
             |    h.h AS h, g.g AS g
             |  FROM a2, h, g),
             |v AS (SELECT n, a2akn,
             |    (4.0 * g - 6.0) * 2 + (10.0 - 6.0 * g) * hc AS a,
             |    (2.0 * g - 4.0) * 9 + 8.0 * h * 3 + (2.0 * g - 14.0 * h - 4.0) * hc - 8.0 * h + 4.0 * g - 6.0 AS b,
             |    (6.0 * h + 2.0 * g - 2.0) * 9 + (4.0 * h - 4.0 * g + 6.0) * 3 + (2.0 * h - 6.0) * hc + 4.0 * h AS c,
             |    (2.0 * h + 6.0) * 9 - 4.0 * h * 3 AS d
             |  FROM mm),
             |f AS (SELECT n, a2akn,
             |    CASE WHEN n >= 4 THEN
             |      (a * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) +
             |       b * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) +
             |       c * CAST(n AS DOUBLE) + d) /
             |      ((CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0)) END AS variance
             |  FROM v)
             |SELECT n, CAST(3 AS INT) AS k, a2akn, variance,
             |  CASE WHEN variance > 0 THEN (a2akn - 2.0) / sqrt(variance) END AS t
             |FROM f""".stripMargin))
  )
}
