package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 61 (round 16, session 2): Bartlett's variance
  * homogeneity (the parametric sibling of q297's Brown–Forsythe),
  * Page's ordered-trend test (the monotone alternative to q379's
  * Friedman), and Krippendorff's alpha (the missing-tolerant
  * agreement statistic beside q377's Fleiss).
  */
private[graft] object Batch61 {

  val queries: Seq[Q] = Seq(

    // Bartlett across the five order priorities on q296's 1e-6-scaled
    // fixture (the chi2 is scale-invariant; the scaling keeps every
    // double->decimal cast off the rounding boundary): exact decimal
    // moments, ordered cross-group folds, the corrected chi2 chain.
    Q("q381_bartlett",
      (s, dir) => graft.operators.Analytics.bartlettTest(
        Tables.orders(s, dir)
          .withColumn("v", col("o_totalprice") / 1000000),
        "o_orderpriority", "v"),
      Some("""WITH base AS (SELECT o_orderpriority AS grp, o_totalprice / 1000000 AS v
             |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
             |g0 AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
             |    SUM(CAST(v AS DECIMAL(28,12))) AS s1g,
             |    SUM(CAST(v * v AS DECIMAL(28,12))) AS s2g
             |  FROM base GROUP BY 1),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_excluded FROM g0 WHERE ng < 2),
             |g AS (SELECT grp, ng,
             |    CAST(s2g AS DOUBLE) - CAST(s1g AS DOUBLE) * CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE) AS wt
             |  FROM g0 WHERE ng >= 2),
             |gt AS (SELECT grp, ng, wt,
             |    CAST(ng - 1 AS DOUBLE) * ln(wt / CAST(ng - 1 AS DOUBLE)) AS li,
             |    1.0 / CAST(ng - 1 AS DOUBLE) AS ci
             |  FROM g),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
             |    MIN(wt) AS minw,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(wt ORDER BY grp)), (x, y) -> x + y) AS w,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(li ORDER BY grp)), (x, y) -> x + y) AS l,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(ci ORDER BY grp)), (x, y) -> x + y) AS c
             |  FROM gt),
             |f AS (SELECT a.k, exc.k_excluded, a.n, a.minw,
             |    CAST(a.n AS DOUBLE) - CAST(a.k AS DOUBLE) AS dofw,
             |    a.w, a.l, a.c
             |  FROM a, exc)
             |SELECT k, k_excluded, n,
             |  CASE WHEN k > 1 AND n > k AND minw > 0
             |    THEN (dofw * ln(w / dofw) - l)
             |      / (1.0 + (c - 1.0 / dofw) / (3.0 * (CAST(k AS DOUBLE) - 1.0)))
             |  END AS chi2,
             |  CAST(k - 1 AS BIGINT) AS dof
             |FROM f""".stripMargin)),

    // Page's L across the hypothesized view < click < purchase value
    // ordering within 20 user-bucket blocks: within-block mid-ranks,
    // exact position-weighted rank sums, the no-ties z chain.
    Q("q382_page_trend",
      (s, dir) => {
        val cell = Tables.events(s, dir)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .groupBy(pmod(col("user_id"), lit(20L)).as("b"),
            col("event_type").as("t"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        graft.operators.Analytics.pageTrendTest(cell, "b", "t", "v",
          Seq("view", "click", "purchase"))
      },
      Some("""WITH cell AS (SELECT user_id % 20 AS b, event_type AS t,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
             |  FROM events WHERE event_type IN ('view','click','purchase') GROUP BY 1, 2),
             |per AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS kt FROM cell GROUP BY 1),
             |keptb AS (SELECT b FROM per WHERE kt = 3),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded FROM per WHERE kt <> 3),
             |kept AS (SELECT cell.* FROM cell JOIN keptb ON cell.b = keptb.b),
             |m AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS m FROM kept),
             |vt AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS tc FROM kept GROUP BY 1, 2),
             |cum AS (SELECT b, v, tc,
             |    COALESCE(SUM(tc) OVER (PARTITION BY b ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM vt),
             |ranked AS (SELECT k2.t, 2 * cum.bef + cum.tc + 1 AS r2
             |  FROM kept k2 JOIN cum ON k2.b = cum.b AND k2.v = cum.v),
             |pos AS (SELECT * FROM (VALUES ('view', 1), ('click', 2), ('purchase', 3)) AS p(t, c)),
             |l2 AS (SELECT COALESCE(SUM(CAST(pos.c AS DECIMAL(38,0)) * ranked.r2), 0) AS l2
             |  FROM ranked JOIN pos ON ranked.t = pos.t),
             |f AS (SELECT m.m, exc.n_excluded,
             |    CAST(l2.l2 AS DOUBLE) / 2.0 AS l_stat,
             |    CAST(m.m AS DOUBLE) * 3.0 * 16.0 / 4.0 AS mu,
             |    CAST(m.m AS DOUBLE) * 9.0 * 16.0 * 2.0 / 144.0 AS sig2
             |  FROM m, l2, exc)
             |SELECT m AS n_blocks, CAST(3 AS BIGINT) AS k, n_excluded,
             |  l_stat, mu, SQRT(sig2) AS sigma,
             |  CASE WHEN sig2 > 0 THEN (l_stat - mu) / SQRT(sig2) END AS z
             |FROM f""".stripMargin)),

    // Krippendorff's alpha over five-event blocks with every seventh
    // rating REMOVED - units carry 4 or 5 ratings, the varying-m
    // regime Fleiss cannot handle; per-unit pairable-mass weighting
    // and the exact D_e cross-product replayed.
    Q("q383_krippendorff",
      (s, dir) => graft.functions.ML.krippendorffAlpha(
        Tables.events(s, dir)
          .filter(pmod(col("event_id"), lit(7L)) =!= 0L)
          .withColumn("unit", expr("event_id div 5")),
        "unit", "event_type"),
      Some("""WITH r AS (SELECT event_id // 5 AS u, event_type AS k FROM events
             |  WHERE event_type IS NOT NULL AND event_id % 7 <> 0),
             |cells AS (SELECT u, k, CAST(COUNT(*) AS BIGINT) AS c FROM r GROUP BY 1, 2),
             |per AS (SELECT u, CAST(SUM(c) AS BIGINT) AS m FROM cells GROUP BY 1),
             |kept AS (SELECT * FROM per WHERE m >= 2),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units_excluded FROM per WHERE m < 2),
             |units AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             |    CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_ratings FROM kept),
             |j AS (SELECT cells.u, cells.k, cells.c, kept.m
             |  FROM cells JOIN kept ON cells.u = kept.u),
             |dn AS (SELECT CAST(COALESCE(SUM(CAST(
             |      CAST(c AS DOUBLE) * CAST(m - c AS DOUBLE) / CAST(m - 1 AS DOUBLE)
             |    AS DECIMAL(28,12))), 0) AS DOUBLE) AS dd FROM j),
             |ct AS (SELECT k, CAST(SUM(c) AS BIGINT) AS nc FROM j GROUP BY 1),
             |de AS (SELECT COALESCE(SUM(CAST(nc AS DECIMAL(38,0)) * (u2.n - nc)), 0) AS de
             |  FROM ct, (SELECT n_ratings AS n FROM units) u2),
             |f AS (SELECT units.n_units, exc.n_units_excluded, units.n_ratings,
             |    CASE WHEN units.n_ratings > 0
             |      THEN dn.dd / CAST(units.n_ratings AS DOUBLE) END AS d_o,
             |    CASE WHEN units.n_ratings > 1
             |      THEN CAST(de.de AS DOUBLE)
             |        / (CAST(units.n_ratings AS DOUBLE) * (CAST(units.n_ratings AS DOUBLE) - 1.0)) END AS d_e
             |  FROM units, exc, dn, de)
             |SELECT n_units, n_units_excluded, n_ratings, d_o, d_e,
             |  CASE WHEN d_e > 0 THEN 1.0 - d_o / d_e END AS alpha
             |FROM f""".stripMargin))
  )
}
