package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 79 (round 18, wave 5): quantile treatment
  * effect with a paired bootstrap CI, split-conformal calibration, and
  * the post-stratified survey estimator.
  */
private[graft] object Batch79 {

  val queries: Seq[Q] = Seq(

    // Quantile treatment effect (p75) between hash-split purchase
    // arms, 10 paired Poisson replicates: both arms' weighted
    // quantiles per replicate from ONE prefix, the paired differences,
    // and the percentile interval all replayed by DuckDB.
    Q("q439_bootstrap_qte",
      (s, dir) => graft.functions.ML.bootstrapQuantileDiffCI(
        Tables.events(s, dir).filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "qd") <
              2147483648L, "a").otherwise("b")),
        "grp", "event_id", "value", "a", "b",
        p = 0.75, b = 10, salt = "qd"),
      Some("""WITH reps AS (SELECT unnest(range(0, 10)) AS rep),
             |base AS (SELECT value AS v,
             |    CASE WHEN CAST('0x' || substr(md5('qd' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'a' ELSE 'b' END AS arm,
             |    CAST('0x' || substr(md5('qd' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
             |    CAST('0x' || substr(md5('qd' || CAST(event_id AS VARCHAR)), 9, 8) AS BIGINT) AS h2
             |  FROM events WHERE event_type = 'purchase'
             |    AND value IS NOT NULL AND event_id IS NOT NULL),
             |m0 AS (SELECT reps.rep, base.arm, base.v,
             |    xor(h1, (h2 + reps.rep * 2654435761) % 4294967296) AS x0
             |  FROM base CROSS JOIN reps),
             |m1 AS (SELECT rep, arm, v, (x0 * 1597334677) % 4294967296 AS x1 FROM m0),
             |m2 AS (SELECT rep, arm, v,
             |    (xor(x1, x1 >> 16) * 887987685) % 4294967296 AS x3 FROM m1),
             |r AS (SELECT rep, arm, v,
             |    CAST(xor(x3, x3 >> 13) AS DOUBLE) / 4294967296.0 AS u FROM m2),
             |w AS (SELECT rep, arm, v, CASE
             |    WHEN u < 0.36787944117144233 THEN 0
             |    WHEN u < 0.7357588823428847 THEN 1
             |    WHEN u < 0.9196986029286058 THEN 2
             |    WHEN u < 0.9810118431238462 THEN 3
             |    WHEN u < 0.9963401531726563 THEN 4
             |    WHEN u < 0.9994058151824183 THEN 5
             |    WHEN u < 0.9999167588507119 THEN 6
             |    WHEN u < 0.9999897508033253 THEN 7
             |    ELSE 8 END AS w FROM r),
             |wa AS (SELECT arm, rep, v, w FROM w
             |  UNION ALL SELECT arm, -1 AS rep, v, 1 AS w FROM base),
             |vc AS (SELECT arm, rep, v, CAST(SUM(w) AS BIGINT) AS c
             |  FROM wa GROUP BY 1, 2, 3),
             |cm AS (SELECT arm, rep, v, SUM(c) OVER
             |    (PARTITION BY arm, rep ORDER BY v ROWS UNBOUNDED PRECEDING)
             |    AS incl FROM vc),
             |tot AS (SELECT arm, rep, CAST(SUM(c) AS BIGINT) AS n
             |  FROM vc GROUP BY 1, 2),
             |tgt AS (SELECT arm, rep, n, CASE WHEN n > 0 THEN
             |    CAST(CEIL(0.75 * CAST(n AS DOUBLE)) AS BIGINT) END AS t FROM tot),
             |st AS (SELECT cm.arm, cm.rep,
             |    MIN(CASE WHEN cm.incl >= tgt.t THEN cm.v END) AS stat,
             |    MAX(tgt.n) AS n
             |  FROM cm JOIN tgt ON cm.arm = tgt.arm AND cm.rep = tgt.rep
             |  GROUP BY 1, 2),
             |wide AS (SELECT rep,
             |    MIN(CASE WHEN arm = 'a' THEN stat END) AS qa,
             |    MIN(CASE WHEN arm = 'b' THEN stat END) AS qb,
             |    MAX(CASE WHEN arm = 'a' THEN n END) AS na,
             |    MAX(CASE WHEN arm = 'b' THEN n END) AS nb
             |  FROM st GROUP BY 1),
             |est AS (SELECT qa AS est_a, qb AS est_b, na AS n_a, nb AS n_b
             |  FROM wide WHERE rep = -1),
             |rs AS (SELECT qa - qb AS d FROM wide
             |  WHERE rep >= 0 AND qa IS NOT NULL AND qb IS NOT NULL),
             |beff AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_eff FROM rs),
             |rc AS (SELECT d AS sv, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM rs GROUP BY 1),
             |rcum AS (SELECT sv, SUM(c) OVER
             |    (ORDER BY sv ROWS UNBOUNDED PRECEDING) AS incl FROM rc),
             |bounds AS (SELECT
             |    MIN(CASE WHEN rcum.incl >= GREATEST(1,
             |      CAST(CEIL(0.025 * CAST(b_eff AS DOUBLE)) AS BIGINT))
             |      THEN sv END) AS lo,
             |    MIN(CASE WHEN rcum.incl >= GREATEST(1,
             |      CAST(CEIL(0.975 * CAST(b_eff AS DOUBLE)) AS BIGINT))
             |      THEN sv END) AS hi
             |  FROM rcum CROSS JOIN beff)
             |SELECT CAST(0.75 AS DOUBLE) AS p, CAST(10 AS BIGINT) AS b,
             |  beff.b_eff, est.n_a, est.n_b, est.est_a, est.est_b,
             |  est.est_a - est.est_b AS diff, bounds.lo, bounds.hi
             |FROM est CROSS JOIN beff CROSS JOIN bounds""".stripMargin)),

    // Split conformal on a deterministic residual column (calibration
    // = every 3rd doc): the exact order-statistic qhat at alpha = 0.1
    // and the eval-slice empirical coverage, both replayed by DuckDB.
    Q("q440_conformal",
      (s, dir) => graft.functions.ML.conformalQuantile(
        Tables.documents(s, dir).select(
          abs(pmod(col("doc_id") * 2654435761L, lit(1000L))
            .cast("double") / lit(100.0) - lit(5.0)).as("resid"),
          (col("doc_id") % 3 === 0).as("cal")),
        col("cal"), "resid", alpha = 0.1),
      Some("""WITH b AS (SELECT
             |    ABS(CAST((doc_id * 2654435761) % 1000 AS DOUBLE) / 100.0 - 5.0) AS r,
             |    doc_id % 3 = 0 AS cal FROM documents),
             |rc AS (SELECT r,
             |    CAST(SUM(CASE WHEN cal THEN 1 ELSE 0 END) AS BIGINT) AS cc,
             |    CAST(SUM(CASE WHEN NOT cal THEN 1 ELSE 0 END) AS BIGINT) AS ce
             |  FROM b GROUP BY r),
             |tot AS (SELECT CAST(SUM(cc) AS BIGINT) AS n_cal,
             |    CAST(SUM(ce) AS BIGINT) AS n_eval FROM rc),
             |kk AS (SELECT n_cal, n_eval,
             |    CAST(CEIL((CAST(n_cal AS DOUBLE) + 1.0) * 0.9) AS BIGINT) AS k
             |  FROM tot),
             |cm AS (SELECT r, cc, ce, SUM(cc) OVER
             |    (ORDER BY r ROWS UNBOUNDED PRECEDING) AS incl FROM rc),
             |q AS (SELECT MIN(CASE WHEN cm.incl >= kk.k AND kk.k <= kk.n_cal
             |    THEN cm.r END) AS qhat FROM cm CROSS JOIN kk),
             |cov AS (SELECT
             |    CAST(SUM(CASE WHEN rc.r <= q.qhat THEN ce ELSE 0 END) AS DOUBLE)
             |      / CAST(SUM(ce) AS DOUBLE) AS cv
             |  FROM rc CROSS JOIN q)
             |SELECT kk.n_cal, kk.n_eval, kk.k, q.qhat,
             |  CASE WHEN kk.n_eval > 0 AND q.qhat IS NOT NULL
             |    THEN cov.cv END AS coverage_eval,
             |  kk.k > kk.n_cal AS clamped
             |FROM kk CROSS JOIN q CROSS JOIN cov""".stripMargin)),

    // Post-stratified mean of value over the designed 5:3:2 event-type
    // mix: per-stratum exact-decimal moments, the fixed-order weighted
    // fold, and the within-stratum variance SE all replayed by DuckDB.
    Q("q441_stratified_mean",
      (s, dir) => graft.functions.ML.stratifiedMean(
        Tables.events(s, dir), "event_type", "value",
        Seq("view" -> 5.0, "click" -> 3.0, "purchase" -> 2.0)),
      Some("""WITH s AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             |    CAST(SUM(CASE WHEN event_type = 'view' AND value IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s0,
             |    CAST(SUM(CASE WHEN event_type = 'view' AND value IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ss0,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND value IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND value IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ss1,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s2,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ss2,
             |    CAST(SUM(CASE WHEN event_type IN ('view','click','purchase') THEN 0 ELSE 1 END) AS BIGINT) AS n_other
             |  FROM events),
             |t AS (SELECT *, n0 + n1 + n2 AS n FROM s)
             |SELECT n, n_other, CAST(3 AS BIGINT) AS k,
             |  CASE WHEN n0 > 0 THEN 0.5 * (s0 / CAST(n0 AS DOUBLE)) END
             |    + CASE WHEN n1 > 0 THEN 0.3 * (s1 / CAST(n1 AS DOUBLE)) END
             |    + CASE WHEN n2 > 0 THEN 0.2 * (s2 / CAST(n2 AS DOUBLE)) END
             |    AS estimate,
             |  sqrt(
             |    CASE WHEN n0 >= 2 THEN 0.5 * 0.5 * ((ss0 - s0 * s0 / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE) END
             |    + CASE WHEN n1 >= 2 THEN 0.3 * 0.3 * ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE) END
             |    + CASE WHEN n2 >= 2 THEN 0.2 * 0.2 * ((ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE) END
             |  ) AS se
             |FROM t""".stripMargin))
  )
}
