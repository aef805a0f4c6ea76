package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 90 (round 19, continuation wave O): the post-
  * stratified two-arm test and DerSimonian–Laird random-effects
  * meta-analysis.
  */
private[graft] object Batch90 {

  val queries: Seq[Q] = Seq(

    // Post-stratified A/B on orders: strata = order priority, hash
    // split on the key, +1000 planted on arm B. Per-stratum exact
    // decimal moments, the strata-ordered double folds (list_reduce in
    // stratum order), and the Cochran weighted-difference chain all
    // replayed by DuckDB.
    Q("q478_stratified_test",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("o_orderkey"), "pst") <
              2147483648L, "A").otherwise("B"))
          .withColumn("v",
            when(col("grp") === "B", col("o_totalprice") + 1000.0)
              .otherwise(col("o_totalprice")))
        graft.operators.Analytics.stratifiedTest(o, "o_orderpriority",
          "grp", "v", "A", "B")
      },
      Some("""WITH g AS (SELECT o_orderpriority AS st,
             |    CASE WHEN CAST('0x' || substr(md5('pst' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'A' ELSE 'B' END AS grp,
             |    o_totalprice FROM orders
             |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
             |p AS (SELECT st, grp,
             |    CAST(CASE WHEN grp = 'B' THEN o_totalprice + 1000.0
             |      ELSE o_totalprice END AS DECIMAL(18,2)) AS vq FROM g),
             |c AS (SELECT st,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN vq END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN CAST(vq * vq AS DECIMAL(38,4)) END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN vq END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN CAST(vq * vq AS DECIMAL(38,4)) END) AS DOUBLE) AS ssb
             |  FROM p GROUP BY 1),
             |t AS (SELECT st, na, nb, na + nb AS ns,
             |    sa / CAST(na AS DOUBLE) AS ma, sb / CAST(nb AS DOUBLE) AS mb,
             |    (ssa - sa * sa / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) AS va,
             |    (ssb - sb * sb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) AS vb
             |  FROM c),
             |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             |    CAST(SUM(CASE WHEN na = 0 OR nb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_strata_incomplete,
             |    CAST(SUM(CASE WHEN na > 0 AND nb > 0 AND (na < 2 OR nb < 2) THEN 1 ELSE 0 END) AS BIGINT) AS n_strata_smallarm,
             |    CAST(SUM(na) AS BIGINT) AS n_a, CAST(SUM(nb) AS BIGINT) AS n_b,
             |    CAST(SUM(ns) AS BIGINT) AS nn,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      LIST(CAST(ns AS DOUBLE) * (ma - mb) ORDER BY st)), (x, y) -> x + y) AS wd,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      LIST(CAST(ns AS DOUBLE) * CAST(ns AS DOUBLE) *
             |        (va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)) ORDER BY st)), (x, y) -> x + y) AS wv
             |  FROM t),
             |z AS (SELECT *,
             |    CASE WHEN n_strata_incomplete = 0 AND n_strata > 0
             |      THEN wd / CAST(nn AS DOUBLE) END AS diff FROM f),
             |z2 AS (SELECT *,
             |    CASE WHEN diff IS NOT NULL AND n_strata_smallarm = 0
             |      THEN sqrt(wv / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))) END AS se
             |  FROM z)
             |SELECT n_strata, n_strata_incomplete, n_strata_smallarm,
             |  n_a, n_b, diff, se,
             |  CASE WHEN se IS NOT NULL AND se > 0 THEN diff / se END AS z
             |FROM z2""".stripMargin)),

    // DerSimonian-Laird over 25 deterministic synthetic studies built
    // from the nation table (effect and variance as pinned literals of
    // the key): both fold passes (fixed-effect moments, then the
    // tau2-widened weights), the Q/tau2/I2 chain, and the RE pool all
    // replayed in study order.
    Q("q479_meta_analysis",
      (s, dir) => graft.operators.Analytics.randomEffectsMeta(
        Tables.nation(s, dir).select(
          col("n_nationkey").as("sid"),
          (pmod(col("n_nationkey"), lit(7)).cast("double") / 10.0 - 0.3)
            .as("y"),
          (lit(0.01) + pmod(col("n_nationkey"), lit(5)).cast("double") /
            100.0).as("v")),
        "sid", "y", "v"),
      Some("""WITH st AS (SELECT n_nationkey AS sid,
             |    CAST(n_nationkey % 7 AS DOUBLE) / 10.0 - 0.3 AS y,
             |    0.01 + CAST(n_nationkey % 5 AS DOUBLE) / 100.0 AS v
             |  FROM nation),
             |ws0 AS (SELECT sid, y, v, 1.0 / v AS w FROM st),
             |f1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(w ORDER BY sid)), (x, y) -> x + y) AS sw,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(w * y ORDER BY sid)), (x, y) -> x + y) AS swy,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(w * y * y ORDER BY sid)), (x, y) -> x + y) AS swyy,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(w * w ORDER BY sid)), (x, y) -> x + y) AS sww
             |  FROM ws0),
             |d1 AS (SELECT k, sw, sww,
             |    CASE WHEN sw > 0 THEN swy / sw END AS fixed_effect,
             |    CASE WHEN sw > 0 THEN sqrt(1.0 / sw) END AS fixed_se,
             |    CASE WHEN sw > 0 THEN swyy - swy * swy / sw END AS q_stat
             |  FROM f1),
             |d2 AS (SELECT k, fixed_effect, fixed_se, q_stat,
             |    CASE WHEN k >= 2 AND (sw - sww / sw) > 0
             |      THEN GREATEST(CAST(0.0 AS DOUBLE),
             |        (q_stat - (CAST(k AS DOUBLE) - 1.0)) / (sw - sww / sw)) END AS tau2,
             |    CASE WHEN k >= 2 AND q_stat > 0
             |      THEN GREATEST(CAST(0.0 AS DOUBLE),
             |        (q_stat - (CAST(k AS DOUBLE) - 1.0)) / q_stat) END AS i2
             |  FROM d1),
             |f2 AS (SELECT
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      LIST(1.0 / (ws0.v + COALESCE(d2.tau2, 0.0)) ORDER BY ws0.sid)), (x, y) -> x + y) AS sws,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      LIST((1.0 / (ws0.v + COALESCE(d2.tau2, 0.0))) * ws0.y ORDER BY ws0.sid)), (x, y) -> x + y) AS swsy
             |  FROM ws0 CROSS JOIN d2)
             |SELECT d2.k, d2.fixed_effect, d2.fixed_se, d2.q_stat,
             |  d2.tau2, d2.i2,
             |  CASE WHEN f2.sws > 0 THEN f2.swsy / f2.sws END AS re_effect,
             |  CASE WHEN f2.sws > 0 THEN sqrt(1.0 / f2.sws) END AS re_se
             |FROM d2 CROSS JOIN f2""".stripMargin))
  )
}
