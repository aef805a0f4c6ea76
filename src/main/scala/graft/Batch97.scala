package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 97 (round 19, continuation wave X): the
  * covariate balance table ("Table 1" of an experiment report).
  */
private[graft] object Batch97 {

  val queries: Seq[Q] = Seq(

    // Balance table over a hash-split of orders: two genuinely
    // pre-treatment covariates (balanced by construction, |SMD|
    // small) and one with a planted +800 shift on arm B (the broken
    // row the table exists to surface). One 18-column scan stacked to
    // three rows; every SMD chain replayed by DuckDB.
    Q("q489_balance_table",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("o_orderkey"), "bal") <
              2147483648L, "A").otherwise("B"))
          .withColumn("pre",
            col("o_totalprice") * 0.5 + pmod(col("o_orderkey"), lit(11L)))
          .withColumn("shifted",
            when(col("grp") === "B", col("o_totalprice") + 800.0)
              .otherwise(col("o_totalprice")))
        graft.operators.Analytics.balanceTable(o, "grp",
          Seq("o_totalprice", "pre", "shifted"), "A", "B")
      },
      Some("""WITH g AS (SELECT
             |    CASE WHEN CAST('0x' || substr(md5('bal' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'A' ELSE 'B' END AS grp,
             |    o_totalprice,
             |    o_totalprice * 0.5 + (o_orderkey % 11) AS pre,
             |    o_totalprice AS tp, o_orderkey FROM orders),
             |p AS (SELECT grp, o_totalprice AS c1, pre AS c2,
             |    CASE WHEN grp = 'B' THEN tp + 800.0 ELSE tp END AS c3
             |  FROM g),
             |long AS (
             |  SELECT 'o_totalprice' AS covariate, grp,
             |    CAST(c1 AS DECIMAL(18,4)) AS v FROM p
             |  UNION ALL
             |  SELECT 'pre' AS covariate, grp,
             |    CAST(c2 AS DECIMAL(18,4)) AS v FROM p
             |  UNION ALL
             |  SELECT 'shifted' AS covariate, grp,
             |    CAST(c3 AS DECIMAL(18,4)) AS v FROM p),
             |c AS (SELECT covariate,
             |    CAST(SUM(CASE WHEN grp = 'A' AND v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN v END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN CAST(CAST(v AS DECIMAL(38,4)) * v AS DECIMAL(38,8)) END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN grp = 'B' AND v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN v END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN CAST(CAST(v AS DECIMAL(38,4)) * v AS DECIMAL(38,8)) END) AS DOUBLE) AS ssb
             |  FROM long GROUP BY 1),
             |m AS (SELECT covariate, n_a, n_b,
             |    CASE WHEN n_a > 0 THEN sa / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0 THEN sb / CAST(n_b AS DOUBLE) END AS mean_b,
             |    CASE WHEN n_a >= 2 THEN (ssa - sa * sa / CAST(n_a AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
             |    CASE WHEN n_b >= 2 THEN (ssb - sb * sb / CAST(n_b AS DOUBLE))
             |      / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
             |  FROM c),
             |f AS (SELECT *,
             |    CASE WHEN (var_a + var_b) / 2.0 > 0
             |      THEN sqrt((var_a + var_b) / 2.0) END AS sd FROM m)
             |SELECT covariate, n_a, n_b, mean_a, mean_b, var_a, var_b,
             |  CASE WHEN sd > 0 THEN (mean_a - mean_b) / sd END AS smd
             |FROM f ORDER BY covariate""".stripMargin))
  )
}
