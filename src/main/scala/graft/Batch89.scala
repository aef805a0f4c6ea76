package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 89 (round 19, continuation wave N): the MDE
  * horizon curve (experiment-duration sizing) and the Dekkers–Einmahl–
  * de Haan moment tail index (the whole-real-line Hill extension).
  */
private[graft] object Batch89 {

  val queries: Seq[Q] = Seq(

    // MDE horizon on the q438 fixture (orders, hash split): the
    // observed exact-decimal moments scaled along a 12-period accrual
    // spine - "how many periods until the test can see the shift we
    // care about". The spine and the per-m chain replay in DuckDB via
    // generate_series.
    Q("q476_mde_horizon",
      (s, dir) => {
        val o = Tables.orders(s, dir).withColumn("grp",
          when(graft.functions.Sampling.hashU32(col("o_orderkey"), "mde") <
            2147483648L, "A").otherwise("B"))
        graft.operators.Analytics.mdeHorizon(o, "grp", "o_totalprice",
          "A", "B", periods = 12)
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
             |mo AS (SELECT n_a, n_b,
             |    sb / CAST(n_b AS DOUBLE) AS mean_b,
             |    CASE WHEN n_a >= 2 THEN (ssa - sa * sa / CAST(n_a AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
             |    CASE WHEN n_b >= 2 THEN (ssb - sb * sb / CAST(n_b AS DOUBLE))
             |      / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
             |  FROM s),
             |sp AS (SELECT CAST(generate_series AS BIGINT) AS m
             |  FROM generate_series(1, 12)),
             |j AS (SELECT sp.m, mo.* FROM sp CROSS JOIN mo),
             |w AS (SELECT m, m * n_a AS n_a_cum, m * n_b AS n_b_cum,
             |    mean_b,
             |    var_a / CAST(m * n_a AS DOUBLE)
             |      + var_b / CAST(m * n_b AS DOUBLE) AS se2
             |  FROM j),
             |f AS (SELECT m, n_a_cum, n_b_cum, mean_b,
             |    CASE WHEN se2 > 0
             |      THEN (1.959964 + 0.841621) * sqrt(se2) END AS mde_abs
             |  FROM w)
             |SELECT m, n_a_cum, n_b_cum, mde_abs,
             |  CASE WHEN mean_b <> 0.0 THEN mde_abs / mean_b END AS mde_rel
             |FROM f ORDER BY m""".stripMargin)),

    // DEdH moment tail index over the top-100 purchase values (the
    // q455 Hill fixture): both exact-decimal ln-moment sums, the
    // xi chain with its degenerate-denominator guard, and the
    // heavy-tail-only alpha all replayed by DuckDB.
    Q("q477_gpd_moment",
      (s, dir) => graft.operators.Analytics.gpdMomentTail(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        "value", k = 100),
      Some("""WITH pos AS (SELECT CAST(value AS DOUBLE) AS v FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL
             |    AND CAST(value AS DOUBLE) > 0),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pos FROM pos),
             |top AS (SELECT v FROM pos ORDER BY v DESC LIMIT 101),
             |kt AS (SELECT MIN(v) AS x_k1, COUNT(*) AS c FROM top),
             |s AS (SELECT
             |    COALESCE(CAST(SUM(CAST(ln(top.v / kt.x_k1)
             |      AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS ln1,
             |    COALESCE(CAST(SUM(CAST(ln(top.v / kt.x_k1) * ln(top.v / kt.x_k1)
             |      AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS ln2
             |  FROM top CROSS JOIN kt WHERE top.v > kt.x_k1),
             |mm AS (SELECT n.n_pos, kt.c, kt.x_k1,
             |    CASE WHEN kt.c = 101 THEN s.ln1 / 100.0 END AS m1,
             |    CASE WHEN kt.c = 101 THEN s.ln2 / 100.0 END AS m2
             |  FROM n CROSS JOIN kt CROSS JOIN s),
             |x AS (SELECT n_pos, c, x_k1, m1, m2,
             |    CASE WHEN m2 > 0 AND (1.0 - m1 * m1 / m2) <> 0.0
             |      THEN m1 + 1.0 - 0.5 / (1.0 - m1 * m1 / m2) END AS xi
             |  FROM mm)
             |SELECT n_pos, CAST(100 AS BIGINT) AS k,
             |  CASE WHEN c = 101 THEN x_k1 END AS x_k1, m1, m2, xi,
             |  CASE WHEN xi > 0 THEN 1.0 / xi END AS alpha
             |FROM x""".stripMargin))
  )
}
