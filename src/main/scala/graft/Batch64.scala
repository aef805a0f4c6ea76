package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 64 (round 16, session 2): Cronbach's alpha
  * (scale reliability / KR-20) and the Conover squared-ranks
  * dispersion test (variance drift without normality).
  */
private[graft] object Batch64 {

  val queries: Seq[Q] = Seq(

    // Cronbach's alpha: do the five event types "score" user buckets
    // consistently (cell = max value) - exact row-sum squares, ordered
    // item-variance fold, the alpha chain replayed.
    Q("q389_cronbach",
      (s, dir) => graft.functions.ML.cronbachAlpha(
        Tables.events(s, dir)
          .withColumn("subj", pmod(col("user_id"), lit(100L))),
        "subj", "event_type", "value"),
      Some("""WITH cell AS (SELECT user_id % 100 AS s, event_type AS i,
             |    MAX(CAST(value AS DECIMAL(18,2))) AS v
             |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
             |  GROUP BY 1, 2),
             |k AS (SELECT CAST(COUNT(DISTINCT i) AS BIGINT) AS k FROM cell),
             |per AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS ki,
             |    CAST(SUM(v) AS DECIMAL(18,2)) AS ri FROM cell GROUP BY 1),
             |kept AS (SELECT per.* FROM per, k WHERE per.ki = k.k),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded
             |  FROM per, k WHERE per.ki <> k.k),
             |rows2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             |    CAST(COALESCE(SUM(ri), 0) AS DECIMAL(18,2)) AS sr,
             |    COALESCE(SUM(ri * ri), 0) AS sr2 FROM kept),
             |kc AS (SELECT cell.* FROM cell JOIN kept ON cell.s = kept.s),
             |it AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni,
             |    CAST(SUM(v) AS DECIMAL(18,2)) AS s1, SUM(v * v) AS s2
             |  FROM kc GROUP BY 1),
             |iv AS (SELECT i, CASE WHEN ni >= 2
             |    THEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(ni AS DOUBLE))
             |      / (CAST(ni AS DOUBLE) - 1.0) END AS var
             |  FROM it),
             |ia AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_items, MIN(var) AS minvar,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(var ORDER BY i)), (x, y) -> x + y) AS sumvar
             |  FROM iv),
             |f AS (SELECT rows2.n_subjects, exc.n_excluded, ia.k_items,
             |    ia.sumvar AS sum_item_var, ia.minvar,
             |    CASE WHEN rows2.n_subjects >= 2
             |      THEN (CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(n_subjects AS DOUBLE))
             |        / (CAST(n_subjects AS DOUBLE) - 1.0) END AS total_var
             |  FROM rows2, exc, ia)
             |SELECT n_subjects, n_excluded, k_items, sum_item_var, total_var,
             |  CASE WHEN n_subjects >= 2 AND k_items > 1 AND total_var > 0
             |      AND minvar IS NOT NULL
             |    THEN (CAST(k_items AS DOUBLE) / (CAST(k_items AS DOUBLE) - 1.0))
             |      * (1.0 - sum_item_var / total_var) END AS alpha
             |FROM f""".stripMargin)),

    // Conover squared-ranks view vs click with a 1.5x dispersion
    // INJECTED into click (pure scale: the test centers per group, so
    // the mean shift cancels and the deviations carry the signal):
    // normalized squared mid-ranks, three pinned score sums, the
    // finite-population z chain replayed.
    Q("q390_conover",
      (s, dir) => graft.operators.Analytics.conoverSquaredRanks(
        Tables.events(s, dir).select(col("event_type"),
          (col("value") * when(col("event_type") === "click", 1.5)
            .otherwise(1.0)).as("v")),
        "event_type", "v", "view", "click"),
      Some("""WITH base AS (SELECT event_type AS g,
             |    CAST(value * CASE WHEN event_type = 'click' THEN 1.5 ELSE 1.0 END AS DOUBLE) AS v
             |  FROM events
             |  WHERE event_type IN ('view','click') AND value IS NOT NULL),
             |m AS (SELECT
             |    CAST(SUM(CASE WHEN g = 'view' THEN CAST(v AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS na0,
             |    CAST(SUM(CASE WHEN g = 'click' THEN CAST(v AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nb0
             |  FROM base),
             |dev AS (SELECT g,
             |    ABS(v - CASE WHEN g = 'view' THEN m.sa / CAST(m.na0 AS DOUBLE)
             |      ELSE m.sb / CAST(m.nb0 AS DOUBLE) END) AS u
             |  FROM base, m),
             |c AS (SELECT u,
             |    CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM dev GROUP BY 1),
             |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             |    CAST(SUM(cb) AS BIGINT) AS n_b FROM c),
             |w AS (SELECT u, ca, cb,
             |    COALESCE(SUM(ca + cb) OVER (ORDER BY u ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM c),
             |sc AS (SELECT ca, cb, tot.n_a, tot.n_b, tot.n_a + tot.n_b AS n,
             |    (CAST(2 * bef + ca + cb + 1 AS DOUBLE) / (CAST(tot.n_a + tot.n_b AS DOUBLE) * 2.0))
             |  * (CAST(2 * bef + ca + cb + 1 AS DOUBLE) / (CAST(tot.n_a + tot.n_b AS DOUBLE) * 2.0)) AS s
             |  FROM w, tot),
             |agg AS (SELECT n_a, n_b, n,
             |    CAST(SUM(CAST(CAST(ca AS DOUBLE) * s AS DECIMAL(28,12))) AS DOUBLE) AS t_stat,
             |    CAST(SUM(CAST(CAST(ca + cb AS DOUBLE) * s AS DECIMAL(28,12))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(CAST(ca + cb AS DOUBLE) * s * s AS DECIMAL(28,12))) AS DOUBLE) AS s2
             |  FROM sc GROUP BY n_a, n_b, n),
             |f AS (SELECT n_a, n_b, n, t_stat,
             |    CAST(n_a AS DOUBLE) * (s1 / CAST(n AS DOUBLE)) AS e_t,
             |    s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS sig2
             |  FROM agg),
             |g2 AS (SELECT n_a, n_b, t_stat, e_t,
             |    CASE WHEN n > 1 THEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * sig2
             |      / (CAST(n AS DOUBLE) - 1.0) END AS var_t
             |  FROM f)
             |SELECT n_a, n_b, t_stat, e_t, var_t,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND var_t > 0
             |    THEN (t_stat - e_t) / SQRT(var_t) END AS z
             |FROM g2""".stripMargin))
  )
}
