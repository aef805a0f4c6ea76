package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 57 (round 16, session 2): inequality and
  * concentration indices — the decomposable entropy pair (Theil T/L),
  * the welfare-normative Atkinson index, and Herfindahl–Hirschman
  * share concentration — beside q238's Gini.
  */
private[graft] object Batch57 {

  val queries: Seq[Q] = Seq(

    // Theil T and L of the price column: one map-combined scan (exact
    // decimal total, pinned x*ln x / ln x term sums), one pinned chain.
    Q("q366_theil",
      (s, dir) => graft.operators.Analytics.theilIndex(
        Tables.lineitem(s, dir).select("l_extendedprice"),
        "l_extendedprice"),
      Some("""WITH a AS (SELECT
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded,
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s,
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN CAST(CAST(l_extendedprice AS DOUBLE) * ln(CAST(l_extendedprice AS DOUBLE)) AS DECIMAL(28,12)) END) AS DOUBLE) AS sxlx,
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN CAST(ln(CAST(l_extendedprice AS DOUBLE)) AS DECIMAL(28,12)) END) AS DOUBLE) AS slx
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |m AS (SELECT n, n_excluded, s / CAST(n AS DOUBLE) AS mean,
             |    sxlx, slx FROM a)
             |SELECT n, n_excluded, mean,
             |  CASE WHEN n > 0 AND mean > 0
             |    THEN sxlx / (CAST(n AS DOUBLE) * mean) - ln(mean) END AS theil_t,
             |  CASE WHEN n > 0 AND mean > 0
             |    THEN ln(mean) - slx / CAST(n AS DOUBLE) END AS theil_l
             |FROM m""".stripMargin)),

    // Per-returnflag Theil: the within-slice inequality profile.
    Q("q367_theil_by",
      (s, dir) => graft.operators.Analytics.theilIndexBy(
        Tables.lineitem(s, dir).select("l_returnflag", "l_extendedprice"),
        Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag"),
      Some("""WITH a AS (SELECT l_returnflag,
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded,
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s,
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN CAST(CAST(l_extendedprice AS DOUBLE) * ln(CAST(l_extendedprice AS DOUBLE)) AS DECIMAL(28,12)) END) AS DOUBLE) AS sxlx,
             |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN CAST(ln(CAST(l_extendedprice AS DOUBLE)) AS DECIMAL(28,12)) END) AS DOUBLE) AS slx
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |m AS (SELECT l_returnflag, n, n_excluded,
             |    s / CAST(n AS DOUBLE) AS mean, sxlx, slx FROM a)
             |SELECT l_returnflag, n, n_excluded, mean,
             |  CASE WHEN n > 0 AND mean > 0
             |    THEN sxlx / (CAST(n AS DOUBLE) * mean) - ln(mean) END AS theil_t,
             |  CASE WHEN n > 0 AND mean > 0
             |    THEN ln(mean) - slx / CAST(n AS DOUBLE) END AS theil_l
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Atkinson at eps = 0.5 (the pow path; eps = 1's geometric form is
    // spec-covered): A = 1 - [(1/n) SUM sqrt(x)]^2 / mu.
    Q("q368_atkinson",
      (s, dir) => graft.operators.Analytics.atkinsonIndex(
        Tables.lineitem(s, dir).select("l_extendedprice"),
        "l_extendedprice", epsilon = 0.5),
      Some("""WITH b AS (SELECT l_extendedprice AS x,
             |    l_extendedprice > 0
             |      AND POW(CAST(l_extendedprice AS DOUBLE), 0.5) < 1e16 AS inc
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |a AS (SELECT
             |    CAST(SUM(CASE WHEN inc THEN 1 ELSE 0 END) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN inc THEN 0 ELSE 1 END) AS BIGINT) AS n_excluded,
             |    CAST(SUM(CASE WHEN inc THEN CAST(x AS DECIMAL(18,2)) END) AS DOUBLE) AS s,
             |    CAST(SUM(CASE WHEN inc THEN CAST(POW(CAST(x AS DOUBLE), 0.5) AS DECIMAL(28,12)) END) AS DOUBLE) AS st
             |  FROM b),
             |m AS (SELECT n, n_excluded, s / CAST(n AS DOUBLE) AS mean, st FROM a)
             |SELECT n, n_excluded, mean,
             |  CASE WHEN n > 0 AND mean > 0
             |    THEN 1.0 - POW(st / CAST(n AS DOUBLE), 2.0) / mean END AS atkinson
             |FROM m""".stripMargin)),

    // Value-mass concentration across event types: HHI of decimal-exact
    // shares, normalized form, and the effective-category count.
    Q("q369_hhi",
      (s, dir) => graft.operators.Analytics.herfindahl(
        Tables.events(s, dir).select("event_type", "value"),
        "event_type", Some("value")),
      Some("""WITH g AS (SELECT event_type,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS m
             |  FROM events
             |  WHERE event_type IS NOT NULL AND value > 0 GROUP BY 1),
             |t AS (SELECT SUM(m) AS t FROM g),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(CAST((CAST(m AS DOUBLE) / CAST(t.t AS DOUBLE))
             |      * (CAST(m AS DOUBLE) / CAST(t.t AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS hhi
             |  FROM g, t)
             |SELECT k, hhi,
             |  CASE WHEN k > 1 THEN (hhi - 1.0 / CAST(k AS DOUBLE))
             |    / (1.0 - 1.0 / CAST(k AS DOUBLE)) END AS hhi_norm,
             |  CASE WHEN hhi > 0 THEN 1.0 / hhi END AS effective_k
             |FROM a""".stripMargin)),

    // Per-segment event-type concentration (count shares): the sliced
    // form - one segment collapsing onto a single event type is
    // invisible to the pooled HHI.
    Q("q370_hhi_by",
      (s, dir) => graft.operators.Analytics.herfindahlBy(
        Tables.events(s, dir)
          .withColumn("seg", pmod(col("user_id"), lit(2L))),
        Seq("seg"), "event_type")
        .orderBy("seg"),
      Some("""WITH g AS (SELECT user_id % 2 AS seg, event_type,
             |    CAST(COUNT(*) AS DECIMAL(38,6)) AS m
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT seg, SUM(m) AS t FROM g GROUP BY 1),
             |a AS (SELECT g.seg, CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(CAST((CAST(m AS DOUBLE) / CAST(t.t AS DOUBLE))
             |      * (CAST(m AS DOUBLE) / CAST(t.t AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS hhi
             |  FROM g JOIN t ON g.seg = t.seg GROUP BY g.seg)
             |SELECT seg, k, hhi,
             |  CASE WHEN k > 1 THEN (hhi - 1.0 / CAST(k AS DOUBLE))
             |    / (1.0 - 1.0 / CAST(k AS DOUBLE)) END AS hhi_norm,
             |  CASE WHEN hhi > 0 THEN 1.0 / hhi END AS effective_k
             |FROM a ORDER BY seg""".stripMargin))
  )
}
