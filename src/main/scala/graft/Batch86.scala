package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 86 (round 19, continuation wave K): cluster-
  * randomized experimentation — the Welch-over-cluster-means test and
  * the ICC/DEFF design-effect readout.
  */
private[graft] object Batch86 {

  val queries: Seq[Q] = Seq(

    // Cluster-randomized A/B on the purchase stream randomized BY USER
    // (hash split on user_id, +30 planted on arm b): per-(arm, user)
    // exact decimal sums -> cluster means -> the cross-cluster ordered
    // double fold (list_reduce in cluster order) -> Welch t across
    // CLUSTER counts. The unit-level test would use n=thousands; this
    // one correctly uses k=users.
    Q("q472_cluster_rand",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("user_id").isNotNull)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("user_id"), "cr") <
              2147483648L, "a").otherwise("b"))
          .withColumn("v",
            when(col("grp") === "b", col("value") + 30.0)
              .otherwise(col("value")))
        graft.operators.Analytics.clusterRandomizedTest(ev, "grp",
          "user_id", "v", "a", "b")
      },
      Some("""WITH g AS (SELECT user_id AS cl,
             |    CASE WHEN CAST('0x' || substr(md5('cr' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'a' ELSE 'b' END AS grp,
             |    value AS v0
             |  FROM events WHERE event_type = 'purchase'
             |    AND user_id IS NOT NULL AND value IS NOT NULL),
             |p AS (SELECT cl, grp,
             |    CASE WHEN grp = 'b' THEN v0 + 30.0 ELSE v0 END AS v FROM g),
             |c AS (SELECT grp, cl, CAST(COUNT(*) AS BIGINT) AS nu,
             |    SUM(CAST(v AS DECIMAL(28,12))) AS sv
             |  FROM p GROUP BY 1, 2),
             |t AS (SELECT grp, cl, nu,
             |    CAST(sv AS DOUBLE) / CAST(nu AS DOUBLE) AS m FROM c),
             |a AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(nu) AS BIGINT) AS n,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(m ORDER BY cl)), (x, y) -> x + y) AS sm,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(m * m ORDER BY cl)), (x, y) -> x + y) AS sm2
             |  FROM t GROUP BY 1),
             |w AS (SELECT
             |    MIN(CASE WHEN grp = 'a' THEN k END) AS k_a,
             |    MIN(CASE WHEN grp = 'b' THEN k END) AS k_b,
             |    MIN(CASE WHEN grp = 'a' THEN n END) AS n_a,
             |    MIN(CASE WHEN grp = 'b' THEN n END) AS n_b,
             |    MIN(CASE WHEN grp = 'a' THEN sm END) AS sma,
             |    MIN(CASE WHEN grp = 'b' THEN sm END) AS smb,
             |    MIN(CASE WHEN grp = 'a' THEN sm2 END) AS sm2a,
             |    MIN(CASE WHEN grp = 'b' THEN sm2 END) AS sm2b
             |  FROM a),
             |m2 AS (SELECT k_a, k_b, n_a, n_b,
             |    sma / CAST(k_a AS DOUBLE) AS mean_a,
             |    smb / CAST(k_b AS DOUBLE) AS mean_b,
             |    CASE WHEN k_a >= 2 THEN (sm2a - sma * sma / CAST(k_a AS DOUBLE))
             |      / (CAST(k_a AS DOUBLE) - 1.0) END AS var_a,
             |    CASE WHEN k_b >= 2 THEN (sm2b - smb * smb / CAST(k_b AS DOUBLE))
             |      / (CAST(k_b AS DOUBLE) - 1.0) END AS var_b
             |  FROM w),
             |f AS (SELECT *,
             |    var_a / CAST(k_a AS DOUBLE) + var_b / CAST(k_b AS DOUBLE) AS se2
             |  FROM m2)
             |SELECT k_a, k_b, n_a, n_b, mean_a, mean_b,
             |  mean_a - mean_b AS diff,
             |  CASE WHEN se2 > 0 THEN sqrt(se2) END AS se,
             |  CASE WHEN se2 > 0
             |    THEN (mean_a - mean_b) / sqrt(se2) END AS t,
             |  CASE WHEN se2 > 0 AND k_a >= 2 AND k_b >= 2 THEN
             |    se2 * se2 / (
             |      (var_a / CAST(k_a AS DOUBLE)) * (var_a / CAST(k_a AS DOUBLE)) / (CAST(k_a AS DOUBLE) - 1.0) +
             |      (var_b / CAST(k_b AS DOUBLE)) * (var_b / CAST(k_b AS DOUBLE)) / (CAST(k_b AS DOUBLE) - 1.0))
             |  END AS dof
             |FROM f""".stripMargin)),

    // Design effect of per-user clustering on purchase values (the
    // q296 1e-6 pre-scaling keeps every double->decimal cast off the
    // scale-12 rounding boundary; ICC and DEFF are scale-invariant):
    // one-way ANOVA moments -> MSB/MSW -> Fisher's ICC(1) with the
    // Kish-adjusted mean cluster size -> DEFF = 1 + (mbar - 1) ICC.
    Q("q473_design_effect",
      (s, dir) => graft.operators.Analytics.designEffect(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("user_id").isNotNull)
          .withColumn("v", col("value") / 1000000),
        "user_id", "v"),
      Some("""WITH base AS (SELECT user_id AS cl, value / 1000000 AS v
             |  FROM events WHERE event_type = 'purchase'
             |    AND user_id IS NOT NULL AND value IS NOT NULL),
             |g AS (SELECT cl,
             |    CAST(COUNT(*) AS BIGINT) AS ng,
             |    SUM(CAST(v AS DECIMAL(28,12))) AS s1g,
             |    SUM(CAST(v * v AS DECIMAL(28,12))) AS s2g
             |  FROM base GROUP BY 1),
             |gt AS (SELECT cl, ng, s1g,
             |    CAST(s1g AS DOUBLE) * CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE) AS bt,
             |    CAST(s2g AS DOUBLE) - CAST(s1g AS DOUBLE) * CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE) AS wt
             |  FROM g),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(ng) AS BIGINT) AS n,
             |    SUM(s1g) AS s1,
             |    SUM(CAST(ng AS DECIMAL(38,0)) * ng) AS nn,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(bt ORDER BY cl)), (x, y) -> x + y) AS b,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(wt ORDER BY cl)), (x, y) -> x + y) AS w
             |  FROM gt),
             |f AS (SELECT k, n,
             |    b - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
             |    w AS ssw, nn FROM a),
             |d AS (SELECT k, n,
             |    CASE WHEN k >= 2 THEN ssb / (CAST(k AS DOUBLE) - 1.0) END AS msb,
             |    CASE WHEN n > k THEN ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) END AS msw,
             |    CASE WHEN k >= 2 THEN
             |      (CAST(n AS DOUBLE) - CAST(nn AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (CAST(k AS DOUBLE) - 1.0) END AS n0
             |  FROM f),
             |i AS (SELECT k, n, msb, msw, n0,
             |    CASE WHEN msb IS NOT NULL AND msw IS NOT NULL
             |      AND (msb + (n0 - 1.0) * msw) > 0
             |      THEN (msb - msw) / (msb + (n0 - 1.0) * msw) END AS icc
             |  FROM d)
             |SELECT k, n, msb, msw, n0, icc,
             |  CASE WHEN icc IS NOT NULL AND k > 0
             |    THEN 1.0 + (CAST(n AS DOUBLE) / CAST(k AS DOUBLE) - 1.0) * icc
             |  END AS deff
             |FROM i""".stripMargin))
  )
}
