package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 78 (round 18, wave 4): the two-sample mSPRT
  * (the live A/B dashboard's always-valid test) and minimum-detectable-
  * effect sizing from observed moments.
  */
private[graft] object Batch78 {

  val queries: Seq[Q] = Seq(

    // Two-sample mSPRT over the hash-split purchase stream in event-id
    // order, with a +25 bump planted on every 5th B event: the four
    // per-arm prefix weights (counts + exact decimal sums), the
    // V_t = sigma2(1/n_a + 1/n_b) mixture chain, and the ln(1/alpha)
    // crossing are replayed row-for-row by DuckDB's cumulative window.
    Q("q437_msprt_two_sample",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ms2") <
              2147483648L, "a").otherwise("b"))
          .withColumn("v",
            when(col("grp") === "b" && col("event_id") % 5 === 0,
              col("value") + 25.0).otherwise(col("value")))
        graft.operators.Analytics.msprtTwoSampleTest(ev, "event_id",
          "grp", "v", "a", "b", sigma2 = 8000.0, tau2 = 400.0,
          alpha = 0.05)
      },
      Some("""WITH g AS (SELECT event_id AS t,
             |    CASE WHEN CAST('0x' || substr(md5('ms2' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 1 ELSE 0 END AS ia,
             |    value FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |p AS (SELECT t, ia,
             |    CASE WHEN ia = 0 AND t % 5 = 0 THEN value + 25.0
             |      ELSE value END AS v FROM g),
             |c AS (SELECT t, ia,
             |    CAST(SUM(ia) OVER w AS BIGINT) AS n_a,
             |    CAST(SUM(1 - ia) OVER w AS BIGINT) AS n_b,
             |    SUM(CASE WHEN ia = 1 THEN CAST(v AS DECIMAL(38,12))
             |      ELSE CAST(0 AS DECIMAL(38,12)) END) OVER w AS sa,
             |    SUM(CASE WHEN ia = 0 THEN CAST(v AS DECIMAL(38,12))
             |      ELSE CAST(0 AS DECIMAL(38,12)) END) OVER w AS sb
             |  FROM p WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT t, n_a, n_b,
             |    CASE WHEN n_a > 0
             |      THEN CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0
             |      THEN CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b
             |  FROM c),
             |e AS (SELECT t, n_a, n_b, mean_a, mean_b,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      0.5 * LN((8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             |        / (8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) + 400.0))
             |      + ((mean_a - mean_b) * (mean_a - mean_b) * 400.0)
             |        / (2.0 * (8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             |           * (8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) + 400.0))
             |    END AS e_log FROM m)
             |SELECT t, n_a, n_b, mean_a, mean_b, e_log,
             |  CASE WHEN e_log IS NOT NULL
             |    THEN e_log >= LN(1.0 / 0.05) END AS crossed
             |FROM e ORDER BY t""".stripMargin)),

    // MDE sizing on the q198 welch fixture (orders, hash split): the
    // exact-decimal moments and the (z_alpha + z_power) * se chain,
    // relative to the control mean - the number to read BEFORE
    // trusting any null A/B result.
    Q("q438_mde",
      (s, dir) => {
        val o = Tables.orders(s, dir).withColumn("grp",
          when(graft.functions.Sampling.hashU32(col("o_orderkey"), "mde") <
            2147483648L, "A").otherwise("B"))
        graft.operators.Analytics.mdeTwoSample(o, "grp", "o_totalprice",
          "A", "B")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('mde' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'A' ELSE 'B' END AS grp,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS v
             |  FROM orders),
             |s AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN v END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN v * v END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN v END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN v * v END) AS DOUBLE) AS ssb
             |  FROM g),
             |m AS (SELECT n_a, n_b,
             |    sa / CAST(n_a AS DOUBLE) AS mean_a,
             |    sb / CAST(n_b AS DOUBLE) AS mean_b,
             |    CASE WHEN n_a >= 2 THEN (ssa - sa * sa / CAST(n_a AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
             |    CASE WHEN n_b >= 2 THEN (ssb - sb * sb / CAST(n_b AS DOUBLE))
             |      / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
             |  FROM s),
             |w AS (SELECT *,
             |    var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) AS se2
             |  FROM m)
             |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
             |  CASE WHEN se2 > 0
             |    THEN (1.959964 + 0.841621) * sqrt(se2) END AS mde_abs,
             |  CASE WHEN mean_b <> 0.0 AND se2 > 0
             |    THEN (1.959964 + 0.841621) * sqrt(se2) / mean_b END AS mde_rel
             |FROM w""".stripMargin))
  )
}
