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
             |FROM nn, lo, hi, r""".stripMargin)),

    // Hellinger distance on the q226 drift convention (click values
    // doubled on every third event): the metric member of the binned
    // trio — same spine, same Laplace shares, BC + H replayed.
    Q("q352_hellinger",
      (s, dir) => graft.operators.Analytics.hellingerDistance(
        Tables.events(s, dir).select(col("event_type"),
          (col("value") * when(col("event_type") === "click" &&
            col("event_id") % 3 === 0, 2.0).otherwise(1.0)).as("v")),
        "event_type", "v", "view", "click", lo = 0.0, hi = 400.0,
        bins = 20),
      Some("""WITH vals AS (SELECT event_type AS grp,
             |    value * CASE WHEN event_type = 'click' AND event_id % 3 = 0
             |      THEN 2.0 ELSE 1.0 END AS v
             |  FROM events),
             |b AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin, grp FROM vals),
             |c AS (SELECT bin,
             |    CAST(SUM(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM b GROUP BY bin),
             |spine AS (SELECT unnest(range(0, 20)) AS bin),
             |f AS (SELECT s.bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
             |  FROM spine s LEFT JOIN c ON s.bin = c.bin),
             |t AS (SELECT ca, cb, SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb FROM f),
             |terms AS (SELECT na, nb,
             |    CAST(SQRT((CAST(ca + 1 AS DOUBLE) / CAST(na + 20 AS DOUBLE))
             |            * (CAST(cb + 1 AS DOUBLE) / CAST(nb + 20 AS DOUBLE)))
             |      AS DECIMAL(28,12)) AS term
             |  FROM t),
             |agg AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |    CAST(SUM(term) AS DOUBLE) AS bc
             |  FROM terms GROUP BY na, nb)
             |SELECT n_a, n_b, bc,
             |  SQRT(GREATEST(1.0 - bc, 0.0)) AS hellinger FROM agg""".stripMargin)),

    // Sliced Hellinger: the drift injected ONLY into segment 1 (the
    // discriminating-fixture discipline — seg 1's H must stand clear
    // of seg 0's near-zero).
    Q("q353_hellinger_by",
      (s, dir) => graft.operators.Analytics.hellingerDistanceBy(
        Tables.events(s, dir).select(
          pmod(col("user_id"), lit(2L)).as("seg"), col("event_type"),
          (col("value") * when(col("user_id") % 2 === 1 &&
            col("event_type") === "click" && col("event_id") % 3 === 0,
            2.0).otherwise(1.0)).as("v")),
        Seq("seg"), "event_type", "v", "view", "click", lo = 0.0,
        hi = 400.0, bins = 20)
        .orderBy("seg"),
      Some("""WITH vals AS (SELECT user_id % 2 AS seg, event_type AS grp,
             |    value * CASE WHEN user_id % 2 = 1 AND event_type = 'click'
             |      AND event_id % 3 = 0 THEN 2.0 ELSE 1.0 END AS v
             |  FROM events),
             |b AS (SELECT seg, LEAST(GREATEST(CAST(FLOOR((v - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin, grp FROM vals),
             |c AS (SELECT seg, bin,
             |    CAST(SUM(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM b GROUP BY seg, bin),
             |spine AS (SELECT segs.seg, bins.bin
             |  FROM (SELECT DISTINCT seg FROM c) segs
             |  CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) bins),
             |f AS (SELECT s.seg, s.bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
             |  FROM spine s LEFT JOIN c ON s.seg = c.seg AND s.bin = c.bin),
             |t AS (SELECT seg, ca, cb,
             |    SUM(ca) OVER (PARTITION BY seg) AS na,
             |    SUM(cb) OVER (PARTITION BY seg) AS nb FROM f),
             |terms AS (SELECT seg, na, nb,
             |    CAST(SQRT((CAST(ca + 1 AS DOUBLE) / CAST(na + 20 AS DOUBLE))
             |            * (CAST(cb + 1 AS DOUBLE) / CAST(nb + 20 AS DOUBLE)))
             |      AS DECIMAL(28,12)) AS term
             |  FROM t),
             |agg AS (SELECT seg, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |    CAST(SUM(term) AS DOUBLE) AS bc
             |  FROM terms GROUP BY seg, na, nb)
             |SELECT seg, n_a, n_b, bc,
             |  SQRT(GREATEST(1.0 - bc, 0.0)) AS hellinger
             |FROM agg ORDER BY seg""".stripMargin)),

    // Seasonal Mann-Kendall over the daily mean-value series with a
    // deterministic +0.5/day drift injected (so the trend is real)
    // and day-of-week as the season: within-season pairs only, summed
    // Hirsch-Slack variance, pooled seasonal Sen slope.
    Q("q354_seasonal_mk",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("y0"))
          .withColumn("y", col("y0") + col("day").cast("double") * 0.5)
          .withColumn("dow", pmod(col("day"), lit(7L)))
        graft.operators.Analytics.seasonalMannKendall(daily, "dow", "day", "y")
      },
      Some("""WITH daily AS (SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS y0
             |  FROM events GROUP BY 1),
             |b AS (SELECT day % 7 AS g, CAST(day AS DOUBLE) AS t,
             |    y0 + CAST(day AS DOUBLE) * 0.5 AS y FROM daily),
             |pairs AS (SELECT b2.y - b1.y AS dy, b2.t - b1.t AS dt
             |  FROM b b1 JOIN b b2 ON b1.g = b2.g AND b1.t < b2.t),
             |srow AS (SELECT COALESCE(CAST(SUM(CAST(SIGN(dy) AS BIGINT)) AS BIGINT), 0) AS s FROM pairs),
             |pseason AS (SELECT g, CAST(SUM(u) AS BIGINT) AS ng,
             |    CAST(SUM(u * (u - 1) * (2 * u + 5)) AS BIGINT) AS tg
             |  FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS u FROM b GROUP BY g, y)
             |  GROUP BY g),
             |vrow AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS n_seasons,
             |    CAST(SUM(ng * (ng - 1) * (2 * ng + 5) - tg) AS BIGINT) AS vnum
             |  FROM pseason),
             |slope AS (SELECT quantile_cont(dy / dt, 0.5) AS sen_slope FROM pairs),
             |icept AS (SELECT quantile_cont(b.y - slope.sen_slope * b.t, 0.5) AS intercept
             |  FROM b CROSS JOIN slope),
             |v AS (SELECT *, CAST(vnum AS DOUBLE) / 18.0 AS var_s
             |  FROM srow CROSS JOIN vrow CROSS JOIN slope CROSS JOIN icept)
             |SELECT n, n_seasons, s, var_s,
             |  CASE WHEN var_s > 0 THEN
             |    CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / SQRT(var_s)
             |         WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / SQRT(var_s)
             |         ELSE 0.0 END END AS z,
             |  sen_slope, intercept
             |FROM v""".stripMargin)),

    // Paired t on the same-unit comparison x = value vs
    // y = value + (event_id % 7 - 3): an exact integer per-row shift
    // (the decimal(18,2) casts stay on 2-decimal data - the r15
    // cross-engine cast contract), mean shift 0 by symmetry of the
    // mod-7 residues but nonzero variance.
    Q("q355_paired_t",
      (s, dir) => graft.operators.Analytics.pairedT(
        Tables.events(s, dir).select(col("value").as("x"),
          (col("value") + (pmod(col("event_id"), lit(7L)) - 3L)
            .cast("double")).as("y")),
        "x", "y"),
      Some("""WITH p AS (SELECT CAST(value AS DOUBLE) AS x,
             |    CAST(value AS DOUBLE) + CAST(event_id % 7 - 3 AS DOUBLE) AS y
             |  FROM events),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sd,
             |    CAST(SUM((CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2)))
             |           * (CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2)))) AS DOUBLE) AS sdd
             |  FROM p WHERE x IS NOT NULL AND y IS NOT NULL),
             |c AS (SELECT n, sd / CAST(n AS DOUBLE) AS mean_diff,
             |    (sdd - sd * sd / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
             |  FROM a)
             |SELECT n, mean_diff, SQRT(v) AS sd_diff,
             |  CASE WHEN v > 0 THEN mean_diff / (SQRT(v) / SQRT(CAST(n AS DOUBLE))) END AS t,
             |  CAST(n - 1 AS BIGINT) AS dof FROM c""".stripMargin)),

    // Sliced paired t per user segment.
    Q("q356_paired_t_by",
      (s, dir) => graft.operators.Analytics.pairedTBy(
        Tables.events(s, dir).select(
          pmod(col("user_id"), lit(2L)).as("seg"), col("value").as("x"),
          (col("value") + (pmod(col("event_id"), lit(7L)) - 3L)
            .cast("double")).as("y")),
        Seq("seg"), "x", "y")
        .orderBy("seg"),
      Some("""WITH p AS (SELECT user_id % 2 AS seg, CAST(value AS DOUBLE) AS x,
             |    CAST(value AS DOUBLE) + CAST(event_id % 7 - 3 AS DOUBLE) AS y
             |  FROM events),
             |a AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sd,
             |    CAST(SUM((CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2)))
             |           * (CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2)))) AS DOUBLE) AS sdd
             |  FROM p WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY seg),
             |c AS (SELECT seg, n, sd / CAST(n AS DOUBLE) AS mean_diff,
             |    (sdd - sd * sd / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
             |  FROM a)
             |SELECT seg, n, mean_diff, SQRT(v) AS sd_diff,
             |  CASE WHEN v > 0 THEN mean_diff / (SQRT(v) / SQRT(CAST(n AS DOUBLE))) END AS t,
             |  CAST(n - 1 AS BIGINT) AS dof FROM c ORDER BY seg""".stripMargin)),

    // Wilcoxon signed-rank on the same paired fixture: |d| takes six
    // values with heavy ties (the average-rank + tie-variance path)
    // and d = 0 at residue 3 (the zero-drop path), doubled ranks via
    // the distributed prefix replayed as a window cumsum.
    Q("q357_wilcoxon",
      (s, dir) => graft.operators.Analytics.wilcoxonSignedRank(
        Tables.events(s, dir).select(col("value").as("x"),
          (col("value") + (pmod(col("event_id"), lit(7L)) - 3L)
            .cast("double")).as("y")),
        "x", "y"),
      Some("""WITH p AS (SELECT CAST(value AS DOUBLE) AS x,
             |    CAST(value AS DOUBLE) + CAST(event_id % 7 - 3 AS DOUBLE) AS y
             |  FROM events),
             |d0 AS (SELECT x - y AS d FROM p WHERE x IS NOT NULL AND y IS NOT NULL),
             |z AS (SELECT CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero FROM d0),
             |c AS (SELECT ABS(d) AS ad, CAST(COUNT(*) AS BIGINT) AS c,
             |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp
             |  FROM d0 WHERE d <> 0 GROUP BY 1),
             |r AS (SELECT ad, c, cp,
             |    COALESCE(SUM(c) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM c),
             |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(c * c * c - c) AS BIGINT) AS ties,
             |    CAST(SUM(cp * (2 * cum + c + 1)) AS DOUBLE) AS w2p
             |  FROM r),
             |f AS (SELECT t.n, z.n_zero, w2p / 2.0 AS w_plus,
             |    CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1.0) / 2.0 - w2p / 2.0 AS w_minus,
             |    CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1.0) * (2.0 * CAST(t.n AS DOUBLE) + 5.0) / 24.0
             |      - CAST(ties AS DOUBLE) / 48.0 AS v
             |  FROM t, z)
             |SELECT n, n_zero, w_plus, w_minus,
             |  CASE WHEN v > 0 THEN
             |    (w_plus - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0) / SQRT(v)
             |  END AS z FROM f""".stripMargin)),

    // Sliced Wilcoxon per user segment.
    Q("q358_wilcoxon_by",
      (s, dir) => graft.operators.Analytics.wilcoxonSignedRankBy(
        Tables.events(s, dir).select(
          pmod(col("user_id"), lit(2L)).as("seg"), col("value").as("x"),
          (col("value") + (pmod(col("event_id"), lit(7L)) - 3L)
            .cast("double")).as("y")),
        Seq("seg"), "x", "y")
        .orderBy("seg"),
      Some("""WITH p AS (SELECT user_id % 2 AS seg, CAST(value AS DOUBLE) AS x,
             |    CAST(value AS DOUBLE) + CAST(event_id % 7 - 3 AS DOUBLE) AS y
             |  FROM events),
             |d0 AS (SELECT seg, x - y AS d FROM p WHERE x IS NOT NULL AND y IS NOT NULL),
             |z AS (SELECT seg, CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
             |  FROM d0 GROUP BY seg),
             |c AS (SELECT seg, ABS(d) AS ad, CAST(COUNT(*) AS BIGINT) AS c,
             |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp
             |  FROM d0 WHERE d <> 0 GROUP BY seg, ad),
             |r AS (SELECT seg, ad, c, cp,
             |    COALESCE(SUM(c) OVER (PARTITION BY seg ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM c),
             |t AS (SELECT seg, CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(c * c * c - c) AS BIGINT) AS ties,
             |    CAST(SUM(cp * (2 * cum + c + 1)) AS DOUBLE) AS w2p
             |  FROM r GROUP BY seg),
             |f AS (SELECT z.seg, COALESCE(t.n, 0) AS n, z.n_zero,
             |    COALESCE(w2p / 2.0, 0.0) AS w_plus,
             |    CAST(COALESCE(t.n, 0) AS DOUBLE) * (CAST(COALESCE(t.n, 0) AS DOUBLE) + 1.0) / 2.0
             |      - COALESCE(w2p / 2.0, 0.0) AS w_minus,
             |    CAST(COALESCE(t.n, 0) AS DOUBLE) * (CAST(COALESCE(t.n, 0) AS DOUBLE) + 1.0)
             |      * (2.0 * CAST(COALESCE(t.n, 0) AS DOUBLE) + 5.0) / 24.0
             |      - COALESCE(CAST(ties AS DOUBLE), 0.0) / 48.0 AS v
             |  FROM z LEFT JOIN t ON z.seg = t.seg)
             |SELECT seg, CAST(n AS BIGINT) AS n, n_zero, w_plus, w_minus,
             |  CASE WHEN v > 0 THEN
             |    (w_plus - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0) / SQRT(v)
             |  END AS z FROM f ORDER BY seg""".stripMargin)),

    // Per-group equal-frequency binning: value quartiles WITHIN each
    // event_type (a global grid would mis-bin every slice whose scale
    // differs); the keyed prefix bin table replayed as a per-key
    // window cumsum, joined back onto the rows.
    Q("q359_quantile_bin_by",
      (s, dir) => graft.operators.Aggregations.quantileBinBy(
        Tables.events(s, dir).select(col("event_id"), col("event_type"),
          col("value")),
        Seq("event_type"), "value", 4)
        .select(col("event_id"), col("bin"))
        .orderBy("event_id"),
      Some("""WITH counts AS (SELECT event_type AS k, CAST(value AS DOUBLE) AS v,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
             |cum AS (SELECT k, v,
             |    COALESCE(SUM(c) OVER (PARTITION BY k ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |    SUM(c) OVER (PARTITION BY k) AS n
             |  FROM counts),
             |bins AS (SELECT k, v, CAST((s * 4) // n AS BIGINT) AS bin FROM cum)
             |SELECT e.event_id, bins.bin
             |FROM events e JOIN bins ON e.event_type = bins.k
             |  AND CAST(e.value AS DOUBLE) = bins.v
             |ORDER BY e.event_id""".stripMargin)),

    // Global winsorize transform with exact percentile_cont fences
    // (the hot-slice-safe sibling of ML.winsorize's quantile_disc
    // member fences): [p05, p95] clamp replayed row for row.
    Q("q360_winsorize_cont",
      (s, dir) => graft.operators.Aggregations.winsorizeCont(
        Tables.events(s, dir).select(col("event_id"), col("value")),
        Nil, "value", 0.05, 0.95)
        .select(col("event_id"), col("value_winsorized"))
        .orderBy("event_id"),
      Some("""WITH f AS (SELECT
             |    percentile_cont(0.05) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS flo,
             |    percentile_cont(0.95) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS fhi
             |  FROM events WHERE value IS NOT NULL)
             |SELECT event_id,
             |  CASE WHEN value IS NULL THEN NULL
             |    ELSE LEAST(GREATEST(CAST(value AS DOUBLE), flo), fhi) END AS value_winsorized
             |FROM events CROSS JOIN f ORDER BY event_id""".stripMargin)),

    // Per-event-type winsorize: each slice clamps at ITS OWN fences.
    Q("q361_winsorize_cont_by",
      (s, dir) => graft.operators.Aggregations.winsorizeCont(
        Tables.events(s, dir).select(col("event_id"), col("event_type"),
          col("value")),
        Seq("event_type"), "value", 0.05, 0.95)
        .select(col("event_id"), col("value_winsorized"))
        .orderBy("event_id"),
      Some("""WITH f AS (SELECT event_type,
             |    percentile_cont(0.05) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS flo,
             |    percentile_cont(0.95) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS fhi
             |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
             |SELECT e.event_id,
             |  CASE WHEN e.value IS NULL THEN NULL
             |    ELSE LEAST(GREATEST(CAST(e.value AS DOUBLE), f.flo), f.fhi) END AS value_winsorized
             |FROM events e JOIN f ON e.event_type = f.event_type
             |ORDER BY e.event_id""".stripMargin))
  )
}
