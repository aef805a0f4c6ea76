package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 71 (round 17, wave 3): four-moment shape
  * profile + Jarque–Bera, exact continuous MAD, and the
  * Brunner–Munzel robust rank test.
  */
private[graft] object Batch71 {

  val queries: Seq[Q] = Seq(

    // Moment profile of the price column: exact decimal mean, pinned
    // centered powers ((x-mu)^2 at dec(28,12), cubes/fourths at
    // dec(38,6)), skewness / excess kurtosis / JB chains.
    Q("q413_moments",
      (s, dir) => graft.operators.Analytics.distributionMoments(
        Tables.lineitem(s, dir), "l_extendedprice"),
      Some("""WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) /
             |      CAST(COUNT(*) AS DOUBLE) AS mean
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |a AS (SELECT m.n, m.mean,
             |    CAST(SUM(CAST((CAST(l_extendedprice AS DOUBLE) - m.mean) *
             |      (CAST(l_extendedprice AS DOUBLE) - m.mean) AS DECIMAL(28,12))) AS DOUBLE) AS m2,
             |    CAST(SUM(CAST((CAST(l_extendedprice AS DOUBLE) - m.mean) *
             |      (CAST(l_extendedprice AS DOUBLE) - m.mean) *
             |      (CAST(l_extendedprice AS DOUBLE) - m.mean) AS DECIMAL(38,6))) AS DOUBLE) AS m3,
             |    CAST(SUM(CAST((CAST(l_extendedprice AS DOUBLE) - m.mean) *
             |      (CAST(l_extendedprice AS DOUBLE) - m.mean) *
             |      (CAST(l_extendedprice AS DOUBLE) - m.mean) *
             |      (CAST(l_extendedprice AS DOUBLE) - m.mean) AS DECIMAL(38,6))) AS DOUBLE) AS m4
             |  FROM lineitem, m WHERE l_extendedprice IS NOT NULL
             |  GROUP BY m.n, m.mean),
             |f AS (SELECT n, mean,
             |    CASE WHEN n > 1 THEN sqrt(m2 / (CAST(n AS DOUBLE) - 1.0)) END AS sd,
             |    m2 / CAST(n AS DOUBLE) AS v2, m3, m4
             |  FROM a),
             |g AS (SELECT n, mean, sd,
             |    CASE WHEN v2 > 0 THEN (m3 / CAST(n AS DOUBLE)) / POW(v2, 1.5) END AS skewness,
             |    CASE WHEN v2 > 0 THEN (m4 / CAST(n AS DOUBLE)) / (v2 * v2) - 3.0 END AS kurtosis_excess
             |  FROM f)
             |SELECT n, mean, sd, skewness, kurtosis_excess,
             |  CASE WHEN skewness IS NOT NULL
             |    THEN CAST(n AS DOUBLE) / 6.0 * (skewness * skewness +
             |      kurtosis_excess * kurtosis_excess / 4.0) END AS jb
             |FROM g""".stripMargin)),

    // Exact continuous MAD of the price column: two chained
    // percentile_cont medians (value, then absolute deviation).
    Q("q414_mad",
      (s, dir) => graft.operators.Aggregations.madCont(
        Tables.lineitem(s, dir), "l_extendedprice"),
      Some("""WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    quantile_cont(v, 0.5) AS median FROM b),
             |d AS (SELECT quantile_cont(ABS(b.v - m.median), 0.5) AS mad
             |  FROM b, m)
             |SELECT m.n, m.median, d.mad, d.mad * 1.4826 AS mad_normal
             |FROM m, d""".stripMargin)),

    // Brunner-Munzel on the q400 fixture: stochastic superiority with
    // studentized rank variances - the doubled-midrank block identity
    // keeps every rank statistic an exact decimal(38,0) integer sum.
    Q("q415_brunner_munzel",
      (s, dir) => graft.operators.Analytics.brunnerMunzel(
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
             |    COALESCE(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ba,
             |    COALESCE(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bb
             |  FROM c),
             |terms AS (SELECT ca, cb, t, ba, bb,
             |    2 * (ba + bb) + t + 1 AS r2c,
             |    2 * ((ba + bb) - ba) + (t - ca) AS d2a,
             |    2 * ((ba + bb) - bb) + (t - cb) AS d2b
             |  FROM cum),
             |agg AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             |    CAST(SUM(cb) AS BIGINT) AS n_b,
             |    SUM(CAST(ca AS DECIMAL(38,0)) * r2c) AS rca,
             |    SUM(CAST(cb AS DECIMAL(38,0)) * r2c) AS rcb,
             |    SUM(CAST(ca AS DECIMAL(38,0)) * d2a) AS sda,
             |    SUM(CAST(cb AS DECIMAL(38,0)) * d2b) AS sdb,
             |    SUM(CAST(ca AS DECIMAL(38,0)) * d2a * d2a) AS qda,
             |    SUM(CAST(cb AS DECIMAL(38,0)) * d2b * d2b) AS qdb
             |  FROM terms),
             |mm AS (SELECT n_a, n_b,
             |    CAST(rca AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE)) AS ma,
             |    CAST(rcb AS DOUBLE) / (2.0 * CAST(n_b AS DOUBLE)) AS mb,
             |    CASE WHEN n_a > 1 THEN
             |      (CAST(qda AS DOUBLE) / 4.0 -
             |        CAST(sda AS DOUBLE) * CAST(sda AS DOUBLE) / (4.0 * CAST(n_a AS DOUBLE))) /
             |        (CAST(n_a AS DOUBLE) - 1.0) END AS s2a,
             |    CASE WHEN n_b > 1 THEN
             |      (CAST(qdb AS DOUBLE) / 4.0 -
             |        CAST(sdb AS DOUBLE) * CAST(sdb AS DOUBLE) / (4.0 * CAST(n_b AS DOUBLE))) /
             |        (CAST(n_b AS DOUBLE) - 1.0) END AS s2b
             |  FROM agg),
             |vv AS (SELECT n_a, n_b, ma, mb,
             |    CAST(n_a AS DOUBLE) * s2a AS va,
             |    CAST(n_b AS DOUBLE) * s2b AS vb
             |  FROM mm)
             |SELECT n_a, n_b,
             |  CASE WHEN n_a > 0 AND n_b > 0
             |    THEN (mb - (CAST(n_b AS DOUBLE) + 1.0) / 2.0) / CAST(n_a AS DOUBLE) END AS p_hat,
             |  CASE WHEN va + vb > 0
             |    THEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * (mb - ma) /
             |      ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * sqrt(va + vb)) END AS w,
             |  CASE WHEN va + vb > 0 AND n_a > 1 AND n_b > 1
             |    THEN (va + vb) * (va + vb) /
             |      (va * va / (CAST(n_a AS DOUBLE) - 1.0) +
             |       vb * vb / (CAST(n_b AS DOUBLE) - 1.0)) END AS dof
             |FROM vv""".stripMargin))
  )
}
