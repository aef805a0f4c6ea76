package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 65 (round 16, session 2): relative-rate
  * effects (risk ratio + Cohen's h, Poisson rate ratio), the Chapman
  * capture–recapture coverage estimator, and the stratified log-rank
  * test (q363's pooled form beside q378's CMH).
  */
private[graft] object Batch65 {

  val queries: Seq[Q] = Seq(

    // Risk ratio of high-value events view vs click, with the Katz CI
    // and Cohen's h - the relative-rate report beside q305's odds
    // scale; every count and the pinned chain replayed.
    Q("q391_risk_ratio",
      (s, dir) => graft.operators.Analytics.riskRatio(
        Tables.events(s, dir), "event_type", col("value") > 100,
        "view", "click"),
      Some("""WITH c AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN event_type = 'view' AND value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
             |  FROM events),
             |p AS (SELECT n_a, n_b, x_a, x_b,
             |    CASE WHEN n_a > 0 THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS p_a,
             |    CASE WHEN n_b > 0 THEN CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS p_b
             |  FROM c),
             |r AS (SELECT *, CASE WHEN x_a > 0 AND x_b > 0 THEN p_a / p_b END AS rr,
             |    CASE WHEN x_a > 0 AND x_b > 0
             |      THEN SQRT(1.0 / CAST(x_a AS DOUBLE) - 1.0 / CAST(n_a AS DOUBLE)
             |              + 1.0 / CAST(x_b AS DOUBLE) - 1.0 / CAST(n_b AS DOUBLE)) END AS se
             |  FROM p)
             |SELECT n_a, n_b, x_a, x_b, p_a, p_b, rr,
             |  exp(ln(rr) - 1.96 * se) AS ci_lo,
             |  exp(ln(rr) + 1.96 * se) AS ci_hi,
             |  CASE WHEN p_a IS NOT NULL AND p_b IS NOT NULL
             |    THEN 2.0 * asin(SQRT(p_a)) - 2.0 * asin(SQRT(p_b)) END AS cohens_h
             |FROM r""".stripMargin)),

    // Poisson rate ratio: purchases per unit of activity, odd vs even
    // users (observation unit = user, events = purchase count,
    // exposure = total activity) - exact counts, decimal exposures,
    // the log-CI chain replayed.
    Q("q392_rate_ratio",
      (s, dir) => {
        val per = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("ev"),
            count(lit(1)).cast("double").as("exp"))
          .withColumn("g",
            when(pmod(col("user_id"), lit(2L)) === 0L, "even")
              .otherwise("odd"))
        graft.operators.Analytics.rateRatio(per, "g", "ev", "exp",
          "even", "odd")
      },
      Some("""WITH per AS (SELECT user_id,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ev,
             |    CAST(COUNT(*) AS DOUBLE) AS exp,
             |    CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS g
             |  FROM events GROUP BY user_id),
             |c AS (SELECT
             |    CAST(SUM(CASE WHEN g = 'even' THEN ev ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN g = 'odd' THEN ev ELSE 0 END) AS BIGINT) AS x_b,
             |    CAST(SUM(CASE WHEN g = 'even' THEN CAST(exp AS DECIMAL(18,2)) END) AS DOUBLE) AS t_a,
             |    CAST(SUM(CASE WHEN g = 'odd' THEN CAST(exp AS DECIMAL(18,2)) END) AS DOUBLE) AS t_b
             |  FROM per),
             |r AS (SELECT x_a, x_b, t_a, t_b,
             |    CASE WHEN t_a > 0 THEN CAST(x_a AS DOUBLE) / t_a END AS rate_a,
             |    CASE WHEN t_b > 0 THEN CAST(x_b AS DOUBLE) / t_b END AS rate_b
             |  FROM c),
             |f AS (SELECT *,
             |    CASE WHEN x_a > 0 AND x_b > 0 THEN rate_a / rate_b END AS rate_ratio,
             |    CASE WHEN x_a > 0 AND x_b > 0
             |      THEN SQRT(1.0 / CAST(x_a AS DOUBLE) + 1.0 / CAST(x_b AS DOUBLE)) END AS se
             |  FROM r)
             |SELECT x_a, x_b, t_a, t_b, rate_a, rate_b, rate_ratio,
             |  exp(ln(rate_ratio) - 1.96 * se) AS ci_lo,
             |  exp(ln(rate_ratio) + 1.96 * se) AS ci_hi
             |FROM f""".stripMargin)),

    // Chapman capture-recapture: two deterministic "detector runs"
    // over the corpus (doc_id stripes mod 3 and mod 5, overlap mod 15)
    // estimating the full flagged population - the dedup-coverage QA
    // estimator, bias-corrected and finite at zero overlap.
    Q("q393_chapman",
      (s, dir) => graft.operators.Analytics.chapmanEstimate(
        Tables.documents(s, dir).filter(col("doc_id") % 3 === 0),
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
        "doc_id"),
      Some("""WITH a AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 3 = 0),
             |b AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 5 = 0),
             |n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM a),
             |n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM b),
             |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m
             |  FROM a JOIN b ON a.doc_id = b.doc_id)
             |SELECT n1, n2, m,
             |  (CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
             |    / (CAST(m AS DOUBLE) + 1.0) - 1.0 AS n_hat,
             |  SQRT((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
             |    * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
             |    * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
             |    / ((CAST(m AS DOUBLE) + 1.0) * (CAST(m AS DOUBLE) + 1.0)
             |      * (CAST(m AS DOUBLE) + 2.0))) AS se
             |FROM n1, n2, m""".stripMargin)),

    // Stratified log-rank on q363's fixture with user-parity strata:
    // per-stratum hypergeometric terms on the KEYED prefix, O/E/V
    // pooled across strata (the survival-side CMH).
    Q("q394_logrank_strat",
      (s, dir) => graft.operators.Analytics.logRankStratified(
        Tables.events(s, dir)
          .withColumn("seg", pmod(col("user_id"), lit(2L)))
          .withColumn("dur", col("value").cast("double") +
            when(col("event_type") === "click", 20.0).otherwise(0.0)),
        Seq("seg"), "event_type", "dur",
        pmod(col("event_id"), lit(3L)) =!= 0L, "view", "click"),
      Some("""WITH subj AS (SELECT user_id % 2 AS seg, event_type AS g,
             |    CAST(value AS DOUBLE) +
             |      CASE WHEN event_type = 'click' THEN 20.0 ELSE 0.0 END AS dur,
             |    event_id % 3 <> 0 AS ev
             |  FROM events
             |  WHERE event_type IN ('view','click') AND value IS NOT NULL),
             |c AS (SELECT seg, dur AS t,
             |    CAST(SUM(CASE WHEN g = 'view' AND ev THEN 1 ELSE 0 END) AS BIGINT) AS da,
             |    CAST(SUM(CASE WHEN g = 'view' AND NOT ev THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN g = 'click' AND ev THEN 1 ELSE 0 END) AS BIGINT) AS db,
             |    CAST(SUM(CASE WHEN g = 'click' AND NOT ev THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM subj GROUP BY 1, 2),
             |tot AS (SELECT seg, CAST(SUM(da + ca) AS BIGINT) AS na,
             |    CAST(SUM(db + cb) AS BIGINT) AS nb FROM c GROUP BY 1),
             |r AS (SELECT c.seg, c.t, c.da, c.db, tot.na, tot.nb,
             |    tot.na - COALESCE(SUM(da + ca) OVER (PARTITION BY c.seg ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ra,
             |    tot.nb - COALESCE(SUM(db + cb) OVER (PARTITION BY c.seg ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rb
             |  FROM c JOIN tot ON c.seg = tot.seg),
             |terms AS (SELECT seg, da, ra, rb, ra + rb AS nt,
             |    da + db AS dt FROM r),
             |agg AS (SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS k_strata,
             |    (SELECT CAST(SUM(na) AS BIGINT) FROM tot) AS n_a,
             |    (SELECT CAST(SUM(nb) AS BIGINT) FROM tot) AS n_b,
             |    CAST(SUM(da) AS BIGINT) AS o_a,
             |    CAST(SUM(CAST(CASE WHEN dt > 0
             |      THEN CAST(dt AS DOUBLE) * CAST(ra AS DOUBLE) / CAST(nt AS DOUBLE)
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS e_a,
             |    CAST(SUM(CAST(CASE WHEN dt > 0 AND nt > 1
             |      THEN CAST(dt AS DOUBLE) * CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE)
             |        * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
             |        / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1.0))
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS v
             |  FROM terms),
             |f AS (SELECT k_strata, n_a, n_b, o_a, e_a, v,
             |    CASE WHEN v > 0
             |      THEN (CAST(o_a AS DOUBLE) - e_a) / SQRT(v) END AS z
             |  FROM agg)
             |SELECT k_strata, n_a, n_b, o_a, e_a, v, z, z * z AS chi2
             |FROM f""".stripMargin))
  )
}
