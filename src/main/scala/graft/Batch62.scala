package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 62 (round 16, session 2): the equivalence gate
  * (TOST two-one-sided Welch tests) and Gwet's AC1 — run on q377's
  * exact cells so the kappa↔AC1 prevalence gap is published side by
  * side.
  */
private[graft] object Batch62 {

  val queries: Seq[Q] = Seq(

    // TOST: is the view-click mean value difference provably within
    // +-5 - the regression-gate question welchT cannot answer (absence
    // of significance is not equivalence). Full welch chain + both
    // one-sided statistics replayed.
    Q("q384_tost",
      (s, dir) => graft.operators.Analytics.tostEquivalence(
        Tables.events(s, dir), "event_type", "value", "view", "click",
        margin = 5.0),
      Some("""WITH s AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssb
             |  FROM events),
             |c AS (SELECT n_a, n_b,
             |    sa / CAST(n_a AS DOUBLE) AS mean_a,
             |    sb / CAST(n_b AS DOUBLE) AS mean_b,
             |    (ssa - sa * sa / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
             |    (ssb - sb * sb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS var_b
             |  FROM s),
             |e AS (SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
             |    var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) AS se2,
             |    mean_a - mean_b AS diff
             |  FROM c)
             |SELECT n_a, n_b, mean_a, mean_b, diff,
             |  CASE WHEN se2 > 0 THEN SQRT(se2) END AS se,
             |  CASE WHEN se2 > 0 THEN se2 * se2 /
             |    ((var_a / CAST(n_a AS DOUBLE)) * (var_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
             |     + (var_b / CAST(n_b AS DOUBLE)) * (var_b / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
             |  END AS dof,
             |  CAST(5.0 AS DOUBLE) AS margin,
             |  CASE WHEN se2 > 0 THEN (diff + 5.0) / SQRT(se2) END AS t_lower,
             |  CASE WHEN se2 > 0 THEN (diff - 5.0) / SQRT(se2) END AS t_upper
             |FROM e""".stripMargin)),

    // Gwet's AC1 on q377's exact fixture (five-event blocks rated by
    // event type): same cells, same P_a - only the chance term
    // differs; the published kappa (q377) vs AC1 (this) gap IS the
    // prevalence diagnostic.
    Q("q385_gwet_ac1",
      (s, dir) => graft.functions.ML.gwetAC1(
        Tables.events(s, dir)
          .withColumn("subj", expr("event_id div 5")),
        "subj", "event_type", raters = 5),
      Some("""WITH cells AS (SELECT event_id // 5 AS s, event_type AS k,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |subj AS (SELECT s, CAST(SUM(c) AS BIGINT) AS m,
             |    SUM(CAST(c AS DECIMAL(38,0)) * c) AS s2 FROM cells GROUP BY 1),
             |kept AS (SELECT * FROM subj WHERE m = 5),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded FROM subj WHERE m <> 5),
             |pbar AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             |    COALESCE(SUM(s2), 0) AS ss FROM kept),
             |cat AS (SELECT cells.k, CAST(SUM(cells.c) AS BIGINT) AS ck
             |  FROM cells JOIN kept ON cells.s = kept.s GROUP BY 1),
             |pe AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_categories,
             |    CAST(COALESCE(SUM(CAST(pi * (1.0 - pi) AS DECIMAL(28,12))), 0) AS DOUBLE) AS pesum
             |  FROM (SELECT CAST(ck AS DOUBLE) / (CAST(p.n_subjects AS DOUBLE) * 5.0) AS pi
             |    FROM cat, pbar p)),
             |f AS (SELECT p.n_subjects, exc.n_excluded, 5 AS m,
             |    pe.k_categories,
             |    CASE WHEN p.n_subjects > 0
             |      THEN (CAST(ss AS DOUBLE) - CAST(p.n_subjects AS DOUBLE) * 5.0)
             |        / (CAST(p.n_subjects AS DOUBLE) * 5.0 * 4.0) END AS p_a,
             |    CASE WHEN pe.k_categories > 1
             |      THEN pe.pesum / (CAST(pe.k_categories AS DOUBLE) - 1.0) END AS p_e
             |  FROM pbar p, exc, pe)
             |SELECT n_subjects, n_excluded, m, k_categories, p_a, p_e,
             |  CASE WHEN n_subjects > 0 AND k_categories > 1 AND 1.0 - p_e > 0
             |    THEN (p_a - p_e) / (1.0 - p_e) END AS ac1
             |FROM f""".stripMargin))
  )
}
