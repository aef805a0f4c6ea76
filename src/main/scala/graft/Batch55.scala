package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 55 (round 16): the location family's missing
  * pieces — parametric effect size (Cohen's d + Hedges' g, global and
  * sliced), the count-based median screen (Mood), and the robust shift
  * estimator (Hodges–Lehmann). welchT/mannWhitneyU answer "is the
  * shift real"; these answer "how big is it" in SD units, straddle
  * counts, and value units respectively.
  */
private[graft] object Batch55 {

  val queries: Seq[Q] = Seq(

    // Cohen's d between view and click event values: exact decimal
    // (n, Σv, Σv²) per side, pinned double chain, Hedges J replayed
    // term by term.
    Q("q348_cohen_d",
      (s, dir) => graft.operators.Analytics.cohenD(
        Tables.events(s, dir), "event_type", "value", "view", "click"),
      Some("""WITH s AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssb
             |  FROM events),
             |c AS (SELECT n_a, n_b,
             |    sa / CAST(n_a AS DOUBLE) AS mean_a, sb / CAST(n_b AS DOUBLE) AS mean_b,
             |    (ssa - sa * sa / CAST(n_a AS DOUBLE)) AS qa,
             |    (ssb - sb * sb / CAST(n_b AS DOUBLE)) AS qb,
             |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn
             |  FROM s),
             |e AS (SELECT n_a, n_b, mean_a, mean_b,
             |    (mean_a - mean_b) / sqrt((qa + qb) / (nn - 2.0)) AS d, nn
             |  FROM c)
             |SELECT n_a, n_b, mean_a, mean_b, d,
             |  d * (1.0 - 3.0 / (4.0 * nn - 9.0)) AS g FROM e""".stripMargin)),

    // Sliced Cohen's d per user segment (user_id mod 3): the per-slice
    // effect report beside welchTBy's per-slice significance.
    Q("q349_cohen_d_by",
      (s, dir) => graft.operators.Analytics.cohenDBy(
        Tables.events(s, dir)
          .withColumn("seg", pmod(col("user_id"), lit(3L))),
        Seq("seg"), "event_type", "value", "view", "click")
        .orderBy("seg"),
      Some("""WITH s AS (SELECT user_id % 3 AS seg,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssb
             |  FROM events GROUP BY 1),
             |c AS (SELECT seg, n_a, n_b,
             |    sa / CAST(n_a AS DOUBLE) AS mean_a, sb / CAST(n_b AS DOUBLE) AS mean_b,
             |    (ssa - sa * sa / CAST(n_a AS DOUBLE)) AS qa,
             |    (ssb - sb * sb / CAST(n_b AS DOUBLE)) AS qb,
             |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn
             |  FROM s),
             |e AS (SELECT seg, n_a, n_b, mean_a, mean_b,
             |    (mean_a - mean_b) / sqrt((qa + qb) / (nn - 2.0)) AS d, nn
             |  FROM c)
             |SELECT seg, n_a, n_b, mean_a, mean_b, d,
             |  d * (1.0 - 3.0 / (4.0 * nn - 9.0)) AS g
             |FROM e ORDER BY seg""".stripMargin)),

    // Mood's median test view vs click: exact pooled percentile_cont
    // median (the distributed-prefix machinery), straddle counts with
    // ties-below, Yates-corrected 2x2 chi-square.
    Q("q350_mood_median",
      (s, dir) => graft.operators.Analytics.moodMedianTest(
        Tables.events(s, dir), "event_type", "value", "view", "click"),
      Some("""WITH p AS (SELECT event_type, CAST(value AS DOUBLE) AS v
             |  FROM events WHERE event_type IN ('view','click') AND value IS NOT NULL),
             |m AS (SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med FROM p),
             |cts AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN event_type = 'view' AND v > med THEN 1 ELSE 0 END) AS BIGINT) AS above_a,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND v > med THEN 1 ELSE 0 END) AS BIGINT) AS above_b,
             |    MAX(med) AS grand_median
             |  FROM p CROSS JOIN m),
             |x AS (SELECT n_a, n_b, grand_median, above_a, above_b,
             |    CAST(above_a AS DOUBLE) AS a, CAST(above_b AS DOUBLE) AS b,
             |    CAST(n_a AS DOUBLE) - CAST(above_a AS DOUBLE) AS c2,
             |    CAST(n_b AS DOUBLE) - CAST(above_b AS DOUBLE) AS d2,
             |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n
             |  FROM cts)
             |SELECT n_a, n_b, grand_median, above_a, above_b,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND a + b > 0 AND c2 + d2 > 0 THEN
             |    n * GREATEST(ABS(a * d2 - b * c2) - n / 2.0, 0.0)
             |      * GREATEST(ABS(a * d2 - b * c2) - n / 2.0, 0.0)
             |      / ((a + b) * (c2 + d2) * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             |  END AS chi2 FROM x""".stripMargin)),

    // Hodges-Lehmann shift between view and click values, BUCKETED to
    // the operator's low-cardinality contract (floor(v) mod 101 — at
    // most 101 distinct per side, ≤ ~10k cross cells) and with a
    // deterministic +7 injected into the click side so the estimator
    // has real signal to localize (the discriminating-fixture
    // discipline; both groups otherwise share one distribution and HL
    // would sit at exactly 0): weighted median of the cross-difference
    // multiset via the distributed prefix.
    Q("q351_hodges_lehmann",
      (s, dir) => graft.operators.Analytics.hodgesLehmann(
        Tables.events(s, dir)
          .withColumn("vb", (pmod(floor(col("value")), lit(101L)) +
            when(col("event_type") === "click", 7L).otherwise(0L))
            .cast("double")),
        "event_type", "vb", "view", "click"),
      Some("""WITH p AS (SELECT event_type,
             |    CAST(floor(CAST(value AS DOUBLE)) % 101 +
             |      CASE WHEN event_type = 'click' THEN 7 ELSE 0 END AS DOUBLE) AS v
             |  FROM events WHERE value IS NOT NULL),
             |a AS (SELECT v, COUNT(*) AS c FROM p WHERE event_type = 'view' GROUP BY v),
             |b AS (SELECT v, COUNT(*) AS c FROM p WHERE event_type = 'click' GROUP BY v),
             |d AS (SELECT b.v - a.v AS d, SUM(a.c * b.c) AS w
             |  FROM a CROSS JOIN b GROUP BY 1),
             |c AS (SELECT d, w,
             |    COALESCE(SUM(w) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |    SUM(w) OVER () AS n
             |  FROM d),
             |r AS (SELECT (CAST(n AS DOUBLE) - 1.0) / 2.0 AS t,
             |    CAST(floor((CAST(n AS DOUBLE) - 1.0) / 2.0) AS BIGINT) AS k, n
             |  FROM c LIMIT 1),
             |lo AS (SELECT d FROM c, r WHERE c.s <= r.k AND r.k < c.s + c.w),
             |hi AS (SELECT d FROM c, r WHERE c.s <= LEAST(r.k + 1, r.n - 1) AND LEAST(r.k + 1, r.n - 1) < c.s + c.w),
             |nn AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
             |  FROM p)
             |SELECT nn.n_a, nn.n_b,
             |  lo.d + (r.t - floor(r.t)) * (hi.d - lo.d) AS hl_shift
             |FROM nn, lo, hi, r""".stripMargin))
  )
}
