package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 69 (round 17): Mann–Whitney effect sizes,
  * Holm / Benjamini–Yekutieli multiplicity corrections, exact Lorenz
  * curve + Palma ratio, the series randomness screen (runs,
  * Cox–Stuart, turning points), and the Hosmer–Lemeshow calibration
  * test.
  */
private[graft] object Batch69 {

  private val dailyMean =
    """SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS t,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
      |  FROM events GROUP BY 1""".stripMargin

  private def daily(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .groupBy(expr("ts div 86400000000000").as("t"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("v"))

  val queries: Seq[Q] = Seq(

    // Effect sizes beside the q229 test: CLES (P(view beats click),
    // ties half) and rank-biserial, pure derivations of the same
    // tie-averaged U.
    Q("q400_mw_effects",
      (s, dir) => graft.operators.Analytics.mannWhitneyEffects(
        Tables.events(s, dir)
          .filter(col("event_type").isin("view", "click"))
          .select(col("event_type").as("g"),
            floor(col("value")).cast("double").as("v")),
        "g", "v", "view", "click"),
      Some("""WITH vals AS (SELECT event_type AS grp,
             |    CAST(FLOOR(value) AS DOUBLE) AS v
             |  FROM events WHERE event_type IN ('view','click')),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY v),
             |cum AS (SELECT v, ca, cb, ca + cb AS t,
             |    COALESCE(SUM(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
             |  FROM c),
             |agg AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
             |    SUM(CAST(ca AS DECIMAL(38,0)) * (2 * before + t + 1)) AS r2a,
             |    SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties
             |  FROM cum),
             |ua AS (SELECT n_a, n_b,
             |    (CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0 AS u_a,
             |    CAST(ties AS DOUBLE) AS tiesd,
             |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn
             |  FROM agg),
             |f AS (SELECT n_a, n_b, u_a,
             |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) - u_a AS u_b,
             |    CASE WHEN n_a > 0 AND n_b > 0 AND nn > 1 AND
             |        (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * ((nn + 1) - tiesd / (nn * (nn - 1)))) > 0
             |      THEN (u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) /
             |        sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * ((nn + 1) - tiesd / (nn * (nn - 1))))
             |    END AS z,
             |    CASE WHEN n_a > 0 AND n_b > 0
             |      THEN u_a / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS cles
             |  FROM ua)
             |SELECT n_a, n_b, u_a, u_b, z, cles,
             |  2.0 * cles - 1.0 AS rank_biserial
             |FROM f""".stripMargin)),

    // Holm step-down on q315's hypothesis fixture VERBATIM - strong
    // FWER beside BH's FDR on the same table: tied p-values share the
    // smallest rank's factor (m - #strictly-smaller), running max
    // ascending, cap at 1.
    Q("q401_holm_adjust",
      (s, dir) => {
        val hyp = Tables.events(s, dir)
          .select(col("user_id")).distinct()
          .withColumn("p",
            when(col("user_id") % 97 =!= 0,
              ((col("user_id") * 2654435761L) % 1009L).cast("double")
                / 1009.0))
        graft.operators.Analytics.holmAdjust(hyp, "p")
          .orderBy("user_id")
      },
      Some("""WITH hyp AS (SELECT DISTINCT user_id FROM events),
             |x AS (SELECT user_id,
             |    CASE WHEN user_id % 97 <> 0
             |      THEN CAST((user_id * 2654435761) % 1009 AS DOUBLE) / 1009.0 END AS p
             |  FROM hyp),
             |n AS (SELECT CAST(COUNT(p) AS BIGINT) AS n FROM x),
             |dp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM x WHERE p IS NOT NULL GROUP BY 1),
             |r AS (SELECT p, c, COALESCE(SUM(c) OVER (ORDER BY p ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM dp),
             |q AS (SELECT p, (CAST(n.n AS DOUBLE) - CAST(cum AS DOUBLE)) * CAST(p AS DOUBLE) AS q FROM r, n),
             |m AS (SELECT p, LEAST(1.0, MAX(q) OVER (ORDER BY p ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS mx FROM q)
             |SELECT x.user_id, x.p, m.mx AS p_adj
             |FROM x LEFT JOIN m ON x.p = m.p
             |ORDER BY x.user_id""".stripMargin)),

    // Benjamini-Yekutieli on the same fixture - BH times the exact
    // harmonic constant c(m) (each 1/i pinned to decimal(28,12)),
    // valid under arbitrary test dependence.
    Q("q402_by_adjust",
      (s, dir) => {
        val hyp = Tables.events(s, dir)
          .select(col("user_id")).distinct()
          .withColumn("p",
            when(col("user_id") % 97 =!= 0,
              ((col("user_id") * 2654435761L) % 1009L).cast("double")
                / 1009.0))
        graft.operators.Analytics.byAdjust(hyp, "p")
          .orderBy("user_id")
      },
      Some("""WITH hyp AS (SELECT DISTINCT user_id FROM events),
             |x AS (SELECT user_id,
             |    CASE WHEN user_id % 97 <> 0
             |      THEN CAST((user_id * 2654435761) % 1009 AS DOUBLE) / 1009.0 END AS p
             |  FROM hyp),
             |n AS (SELECT CAST(COUNT(p) AS BIGINT) AS n FROM x),
             |seq AS (SELECT ROW_NUMBER() OVER () AS i FROM x WHERE p IS NOT NULL),
             |h AS (SELECT CAST(SUM(CAST(1.0 / CAST(i AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS cm FROM seq),
             |dp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM x WHERE p IS NOT NULL GROUP BY 1),
             |r AS (SELECT p, c, SUM(c) OVER (ORDER BY p ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r FROM dp),
             |q AS (SELECT p, CAST(p AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(r AS DOUBLE) AS q FROM r, n),
             |m AS (SELECT p, LEAST(1.0, MIN(q) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS mn FROM q)
             |SELECT x.user_id, x.p,
             |  CASE WHEN m.mn IS NULL THEN NULL
             |    ELSE LEAST(1.0, m.mn * h.cm) END AS p_adj
             |FROM x LEFT JOIN m ON x.p = m.p, h
             |ORDER BY x.user_id""".stripMargin)),

    // Exact Lorenz points of the price mass - tied boundary blocks
    // contribute (k - cum_before) * v precisely; both weights (count,
    // mass) ride ONE distributed prefix.
    Q("q403_lorenz",
      (s, dir) => graft.operators.Analytics.lorenzPoints(
        Tables.lineitem(s, dir).select("l_extendedprice"),
        "l_extendedprice", Seq(0.25, 0.5, 0.9, 0.99)),
      Some("""WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
             |    CAST(COUNT(*) AS DECIMAL(19,0)) * CAST(v AS DECIMAL(18,2)) AS m
             |  FROM b GROUP BY v),
             |pre AS (SELECT v, c, m,
             |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sc,
             |    COALESCE(SUM(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sm
             |  FROM c),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(m) AS DECIMAL(38,2)) AS t FROM c),
             |spine AS (SELECT CAST(unnest([0.25, 0.5, 0.9, 0.99]) AS DOUBLE) AS p),
             |k AS (SELECT p, CAST(FLOOR(p * CAST(n AS DOUBLE)) AS BIGINT) AS k,
             |    n, t FROM spine, tot)
             |SELECT k.p, k.n, k.k AS k_rows,
             |  CASE WHEN k.k = 0 THEN 0.0
             |    ELSE CAST(sm + CAST(k.k - sc AS DECIMAL(19,0)) * CAST(v AS DECIMAL(18,2)) AS DOUBLE)
             |      / CAST(t AS DOUBLE) END AS lorenz
             |FROM k LEFT JOIN pre ON sc < k.k AND k.k <= sc + c
             |ORDER BY p""".stripMargin)),

    // Palma ratio of the price mass: top-10% share over bottom-40%
    // share from one Lorenz pass.
    Q("q404_palma",
      (s, dir) => graft.operators.Analytics.palmaRatio(
        Tables.lineitem(s, dir).select("l_extendedprice"),
        "l_extendedprice"),
      Some("""WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
             |    CAST(COUNT(*) AS DECIMAL(19,0)) * CAST(v AS DECIMAL(18,2)) AS m
             |  FROM b GROUP BY v),
             |pre AS (SELECT v, c, m,
             |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sc,
             |    COALESCE(SUM(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sm
             |  FROM c),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(m) AS DECIMAL(38,2)) AS t FROM c),
             |spine AS (SELECT unnest([0.4, 0.9]) AS p),
             |k AS (SELECT p, CAST(FLOOR(p * CAST(n AS DOUBLE)) AS BIGINT) AS k,
             |    n, t FROM spine, tot),
             |l AS (SELECT k.p, k.n,
             |    CASE WHEN k.k = 0 THEN 0.0
             |      ELSE CAST(sm + CAST(k.k - sc AS DECIMAL(19,0)) * CAST(v AS DECIMAL(18,2)) AS DOUBLE)
             |        / CAST(t AS DOUBLE) END AS lorenz
             |  FROM k LEFT JOIN pre ON sc < k.k AND k.k <= sc + c),
             |w AS (SELECT MAX(n) AS n,
             |    MAX(CASE WHEN p = 0.4 THEN lorenz END) AS l40,
             |    MAX(CASE WHEN p = 0.9 THEN lorenz END) AS l90
             |  FROM l)
             |SELECT n, l40, l90,
             |  CASE WHEN l40 > 0 THEN (1.0 - l90) / l40 END AS palma
             |FROM w""".stripMargin)),

    // Runs test on the daily mean-value series: exact interpolated
    // median, ties at the median dropped and counted, runs over the
    // rank pairing, exact null moments.
    Q("q405_runs_test",
      (s, dir) => graft.operators.TimeSeries.runsTest(
        daily(s, dir), "t", "v"),
      Some(s"""WITH daily AS ($dailyMean),
             |med AS (SELECT quantile_cont(v, 0.5) AS med FROM daily),
             |kept AS (SELECT t, CASE WHEN v > med THEN 1 ELSE -1 END AS s
             |  FROM daily, med WHERE v <> med),
             |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
             |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below
             |  FROM kept),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
             |rk AS (SELECT s, ROW_NUMBER() OVER (ORDER BY t) AS r FROM kept),
             |chg AS (SELECT CAST(COALESCE(SUM(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END), 0) AS BIGINT) AS chg
             |  FROM rk a JOIN rk b ON b.r = a.r + 1),
             |f AS (SELECT tot.n, cnt.n_above, cnt.n_below,
             |    tot.n - cnt.m AS n_ties_dropped,
             |    CASE WHEN cnt.m > 0 THEN chg.chg + 1 END AS runs,
             |    CAST(cnt.n_above AS DOUBLE) AS n1, CAST(cnt.n_below AS DOUBLE) AS n2
             |  FROM tot, cnt, chg)
             |SELECT n, n_above, n_below, n_ties_dropped,
             |  CAST(runs AS BIGINT) AS runs,
             |  CASE WHEN n1 + n2 > 1 AND
             |      (2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2)) /
             |        ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))) > 0
             |    THEN (CAST(runs AS DOUBLE) - (1.0 + 2.0 * n1 * n2 / (n1 + n2))) /
             |      sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2)) /
             |        ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))
             |  END AS z
             |FROM f""".stripMargin)),

    // Cox-Stuart trend test on the daily series: first half vs second
    // half at offset ceil(n/2), continuity-corrected sign z.
    Q("q406_cox_stuart",
      (s, dir) => graft.operators.TimeSeries.coxStuartTest(
        daily(s, dir), "t", "v"),
      Some(s"""WITH daily AS ($dailyMean),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM daily),
             |rk AS (SELECT v, ROW_NUMBER() OVER (ORDER BY t) - 1 AS r FROM daily),
             |p AS (SELECT a.v AS v1, b.v AS v2
             |  FROM rk a JOIN n ON a.r < n.m - (n.m + 1) // 2
             |  JOIN rk b ON b.r = a.r + (n.m + 1) // 2),
             |agg AS (SELECT
             |    CAST(COALESCE(SUM(CASE WHEN v2 > v1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS s_plus,
             |    CAST(COALESCE(SUM(CASE WHEN v2 < v1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS s_minus,
             |    CAST(COUNT(*) AS BIGINT) AS n_pairs
             |  FROM p),
             |f AS (SELECT n.m AS n, agg.n_pairs,
             |    agg.n_pairs - agg.s_plus - agg.s_minus AS n_ties,
             |    agg.s_plus, agg.s_minus,
             |    CAST(agg.s_plus AS DOUBLE) + CAST(agg.s_minus AS DOUBLE) AS nt,
             |    CAST(agg.s_plus AS DOUBLE) -
             |      (CAST(agg.s_plus AS DOUBLE) + CAST(agg.s_minus AS DOUBLE)) / 2.0 AS dev
             |  FROM n, agg)
             |SELECT n, n_pairs, n_ties, s_plus, s_minus,
             |  CASE WHEN nt > 0
             |    THEN (dev - 0.5 * SIGN(dev)) / sqrt(nt / 4.0) END AS z
             |FROM f""".stripMargin)),

    // Turning-points test on the daily series: strict local extrema
    // against E = 2(n-2)/3, Var = (16n-29)/90.
    Q("q407_turning_points",
      (s, dir) => graft.operators.TimeSeries.turningPointsTest(
        daily(s, dir), "t", "v"),
      Some(s"""WITH daily AS ($dailyMean),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM daily),
             |rk AS (SELECT v, ROW_NUMBER() OVER (ORDER BY t) AS r FROM daily),
             |j AS (SELECT b.v AS v, a.v AS vp, c.v AS vn
             |  FROM rk b JOIN rk a ON a.r = b.r - 1 JOIN rk c ON c.r = b.r + 1),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_interior,
             |    CAST(COALESCE(SUM(CASE WHEN (v > vp AND v > vn) OR (v < vp AND v < vn)
             |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS turning
             |  FROM j)
             |SELECT n.m AS n, agg.n_interior, agg.turning,
             |  CASE WHEN n.m >= 3
             |    THEN 2.0 * (CAST(n.m AS DOUBLE) - 2.0) / 3.0 END AS expected,
             |  CASE WHEN n.m >= 3 AND (16.0 * CAST(n.m AS DOUBLE) - 29.0) / 90.0 > 0
             |    THEN (CAST(agg.turning AS DOUBLE) - 2.0 * (CAST(n.m AS DOUBLE) - 2.0) / 3.0) /
             |      sqrt((16.0 * CAST(n.m AS DOUBLE) - 29.0) / 90.0) END AS z
             |FROM n, agg""".stripMargin)),

    // Hosmer-Lemeshow over a deterministic calibrated-ish score
    // (P(y|p) ~ p by construction): equal-frequency decile bins on the
    // exact rank, observed vs expected chi2, degenerate bins excluded
    // and counted.
    Q("q408_hosmer_lemeshow",
      (s, dir) => graft.functions.ML.hosmerLemeshow(
        Tables.events(s, dir)
          .select(col("event_id"),
            (pmod(col("event_id"), lit(100L)).cast("double") / 100.0)
              .as("pr")),
        "pr",
        pmod(col("event_id") * 7919L, lit(100L)) <
          pmod(col("event_id"), lit(100L)),
        bins = 10),
      Some("""WITH b AS (SELECT
             |    CAST(event_id % 100 AS DOUBLE) / 100.0 AS pr,
             |    CASE WHEN (event_id * 7919) % 100 < event_id % 100
             |      THEN 1 ELSE 0 END AS y
             |  FROM events),
             |c AS (SELECT pr, CAST(COUNT(*) AS BIGINT) AS c,
             |    CAST(SUM(y) AS BIGINT) AS o FROM b GROUP BY 1),
             |cum AS (SELECT pr, c, o,
             |    COALESCE(SUM(c) OVER (ORDER BY pr ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |    SUM(c) OVER () AS n
             |  FROM c),
             |bins AS (SELECT (s * 10) // n AS bin,
             |    CAST(SUM(c) AS BIGINT) AS ng, CAST(SUM(o) AS BIGINT) AS og,
             |    SUM(CAST(pr AS DECIMAL(18,6)) * c) AS eg
             |  FROM cum GROUP BY 1),
             |t AS (SELECT bin, ng, og, eg,
             |    CAST(eg AS DOUBLE) / CAST(ng AS DOUBLE) AS pbar
             |  FROM bins),
             |agg AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS g,
             |    CAST(SUM(CASE WHEN pbar > 0 AND pbar < 1 THEN 1 ELSE 0 END) AS BIGINT) AS g_used,
             |    CAST(SUM(CASE WHEN pbar > 0 AND pbar < 1
             |      THEN CAST((CAST(og AS DOUBLE) - CAST(eg AS DOUBLE)) *
             |        (CAST(og AS DOUBLE) - CAST(eg AS DOUBLE)) /
             |        (CAST(ng AS DOUBLE) * pbar * (1.0 - pbar)) AS DECIMAL(28,12))
             |      END) AS DOUBLE) AS chi2raw
             |  FROM t)
             |SELECT n, g, g_used,
             |  CASE WHEN g_used > 0 THEN chi2raw END AS chi2,
             |  CASE WHEN g_used > 2 THEN g_used - 2 END AS dof
             |FROM agg""".stripMargin))
  )
}
