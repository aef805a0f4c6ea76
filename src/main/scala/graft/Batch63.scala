package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 63 (round 16, session 2): the continuous
  * method-comparison family — Lin's concordance, Bland–Altman limits
  * of agreement (both on q355's exact paired fixture), and ICC(2,1)
  * absolute-agreement intraclass correlation.
  */
private[graft] object Batch63 {

  val queries: Seq[Q] = Seq(

    // Lin's CCC between a measurement and its integer-perturbed twin
    // (q355's paired fixture): r is high, CCC strictly lower - the
    // agreement penalty is the point; every moment replayed.
    Q("q386_lin_ccc",
      (s, dir) => graft.functions.ML.linConcordance(
        Tables.events(s, dir).select(col("value").as("x"),
          (col("value") + (pmod(col("event_id"), lit(7L)) - 3L)
            .cast("double")).as("y")),
        "x", "y"),
      Some("""WITH p AS (SELECT CAST(value AS DOUBLE) AS x,
             |    CAST(value AS DOUBLE) + CAST(event_id % 7 - 3 AS DOUBLE) AS y
             |  FROM events WHERE value IS NOT NULL),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy
             |  FROM p),
             |c AS (SELECT n,
             |    sx / CAST(n AS DOUBLE) AS mean_x,
             |    sy / CAST(n AS DOUBLE) AS mean_y,
             |    sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) AS vx,
             |    syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS vy,
             |    sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS cxy
             |  FROM a),
             |e AS (SELECT n, mean_x, mean_y, vx, vy, cxy,
             |    (mean_x - mean_y) * (mean_x - mean_y) AS gap
             |  FROM c),
             |f AS (SELECT n, mean_x, mean_y,
             |    CASE WHEN vx > 0 AND vy > 0 THEN cxy / SQRT(vx * vy) END AS r,
             |    CASE WHEN vx + vy + gap > 0 THEN 2.0 * cxy / (vx + vy + gap) END AS ccc
             |  FROM e)
             |SELECT n, mean_x, mean_y, r, ccc,
             |  CASE WHEN r IS NOT NULL AND r <> 0.0 THEN ccc / r END AS c_b
             |FROM f""".stripMargin)),

    // Bland-Altman limits of agreement on the same paired fixture:
    // exact decimal difference moments, bias +- 1.96 sd replayed.
    Q("q387_bland_altman",
      (s, dir) => graft.functions.ML.blandAltman(
        Tables.events(s, dir).select(col("value").as("x"),
          (col("value") + (pmod(col("event_id"), lit(7L)) - 3L)
            .cast("double")).as("y")),
        "x", "y"),
      Some("""WITH p AS (SELECT CAST(value AS DOUBLE) AS x,
             |    CAST(value AS DOUBLE) + CAST(event_id % 7 - 3 AS DOUBLE) AS y
             |  FROM events WHERE value IS NOT NULL),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sd,
             |    CAST(SUM((CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2)))
             |           * (CAST(x AS DECIMAL(18,2)) - CAST(y AS DECIMAL(18,2)))) AS DOUBLE) AS sdd
             |  FROM p),
             |c AS (SELECT n,
             |    CASE WHEN n > 0 THEN sd / CAST(n AS DOUBLE) END AS bias,
             |    CASE WHEN n >= 2
             |      THEN (sdd - sd * sd / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) END AS v
             |  FROM a),
             |f AS (SELECT n, bias,
             |    CASE WHEN v >= 0 THEN SQRT(v) END AS sd_diff FROM c)
             |SELECT n, bias, sd_diff,
             |  bias - 1.96 * sd_diff AS loa_lo,
             |  bias + 1.96 * sd_diff AS loa_hi
             |FROM f""".stripMargin)),

    // ICC(2,1): five event types as random "raters" scoring 100 user
    // buckets (cell = max value) - the two-way decomposition with
    // exact decimal row/column sum squares, absolute agreement.
    Q("q388_icc21",
      (s, dir) => graft.functions.ML.icc21(
        Tables.events(s, dir)
          .withColumn("subj", pmod(col("user_id"), lit(100L))),
        "subj", "event_type", "value"),
      Some("""WITH cell AS (SELECT user_id % 100 AS s, event_type AS r,
             |    MAX(CAST(value AS DECIMAL(18,2))) AS v
             |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
             |  GROUP BY 1, 2),
             |k AS (SELECT CAST(COUNT(DISTINCT r) AS BIGINT) AS k FROM cell),
             |per AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS kr,
             |    CAST(SUM(v) AS DECIMAL(18,2)) AS ri FROM cell GROUP BY 1),
             |kept AS (SELECT per.* FROM per, k WHERE per.kr = k.k),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded
             |  FROM per, k WHERE per.kr <> k.k),
             |kc AS (SELECT cell.* FROM cell JOIN kept ON cell.s = kept.s),
             |tot AS (SELECT CAST(SUM(v) AS DECIMAL(18,2)) AS t,
             |    SUM(v * v) AS sxx FROM kc),
             |rows2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             |    COALESCE(SUM(ri * ri), 0) AS sr2 FROM kept),
             |cols2 AS (SELECT COALESCE(SUM(cj * cj), 0) AS sc2
             |  FROM (SELECT CAST(SUM(v) AS DECIMAL(18,2)) AS cj FROM kc GROUP BY r)),
             |f AS (SELECT rows2.n_subjects, exc.n_excluded, k.k,
             |    CAST(rows2.n_subjects AS DOUBLE) AS nd,
             |    CAST(k.k AS DOUBLE) AS kd,
             |    CAST(tot.t AS DOUBLE) * CAST(tot.t AS DOUBLE)
             |      / (CAST(rows2.n_subjects AS DOUBLE) * CAST(k.k AS DOUBLE)) AS cf,
             |    CAST(tot.sxx AS DOUBLE) AS sxx,
             |    CAST(rows2.sr2 AS DOUBLE) AS sr2,
             |    CAST(cols2.sc2 AS DOUBLE) AS sc2
             |  FROM rows2, exc, k, tot, cols2),
             |g AS (SELECT n_subjects, n_excluded, k, nd, kd,
             |    sxx - cf AS sstot,
             |    sr2 / kd - cf AS ssrows,
             |    sc2 / nd - cf AS sscols
             |  FROM f),
             |h AS (SELECT n_subjects, n_excluded, k, nd, kd,
             |    CASE WHEN nd > 1 THEN ssrows / (nd - 1.0) END AS ms_rows,
             |    CASE WHEN kd > 1 THEN sscols / (kd - 1.0) END AS ms_cols,
             |    CASE WHEN nd > 1 AND kd > 1
             |      THEN (sstot - ssrows - sscols) / ((nd - 1.0) * (kd - 1.0)) END AS ms_err
             |  FROM g),
             |i AS (SELECT n_subjects, n_excluded, k, ms_rows, ms_cols, ms_err,
             |    ms_rows + (kd - 1.0) * ms_err + kd * (ms_cols - ms_err) / nd AS den
             |  FROM h)
             |SELECT n_subjects, n_excluded, k AS k_raters, ms_rows, ms_cols, ms_err,
             |  CASE WHEN den > 0 THEN (ms_rows - ms_err) / den END AS icc21
             |FROM i""".stripMargin))
  )
}
