package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 92 (round 19, continuation wave Q): the event
  * study — diff-in-diff's dynamic per-period form.
  */
private[graft] object Batch92 {

  val queries: Seq[Q] = Seq(

    // Event study over order years (hash-split arms, +500 planted on
    // arm B from 1996 on, base year 1995): per-year exact decimal
    // moments, the Welch chain per period, and the base-normalized
    // dynamic effects all replayed by DuckDB; the pre-1995 years read
    // as the parallel-trends check.
    Q("q482_event_study",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .withColumn("period", year(col("o_orderdate")).cast("string"))
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("o_orderkey"), "evs") <
              2147483648L, "T").otherwise("C"))
          .withColumn("v",
            when(col("grp") === "T" &&
              year(col("o_orderdate")) >= 1996,
              col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        graft.operators.Analytics.eventStudy(o, "grp", "period", "v",
          "T", "C", basePeriod = "1995")
      },
      Some("""WITH g AS (SELECT
             |    CAST(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS VARCHAR) AS period,
             |    CASE WHEN CAST('0x' || substr(md5('evs' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'T' ELSE 'C' END AS grp,
             |    o_totalprice,
             |    CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr
             |  FROM orders WHERE o_orderdate IS NOT NULL
             |    AND o_totalprice IS NOT NULL),
             |p AS (SELECT period, grp,
             |    CAST(CASE WHEN grp = 'T' AND yr >= 1996
             |      THEN o_totalprice + 500.0
             |      ELSE o_totalprice END AS DECIMAL(18,2)) AS vq FROM g),
             |c AS (SELECT period,
             |    CAST(SUM(CASE WHEN grp = 'T' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |    CAST(SUM(CASE WHEN grp = 'T' THEN vq END) AS DOUBLE) AS st,
             |    CAST(SUM(CASE WHEN grp = 'T' THEN CAST(vq * vq AS DECIMAL(38,4)) END) AS DOUBLE) AS sst,
             |    CAST(SUM(CASE WHEN grp = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |    CAST(SUM(CASE WHEN grp = 'C' THEN vq END) AS DOUBLE) AS sc,
             |    CAST(SUM(CASE WHEN grp = 'C' THEN CAST(vq * vq AS DECIMAL(38,4)) END) AS DOUBLE) AS ssc
             |  FROM p GROUP BY 1),
             |t AS (SELECT period, n_t, n_c,
             |    CASE WHEN n_t > 0 THEN st / CAST(n_t AS DOUBLE) END AS mean_t,
             |    CASE WHEN n_c > 0 THEN sc / CAST(n_c AS DOUBLE) END AS mean_c,
             |    CASE WHEN n_t >= 2 THEN (sst - st * st / CAST(n_t AS DOUBLE))
             |      / (CAST(n_t AS DOUBLE) - 1.0) END AS vt,
             |    CASE WHEN n_c >= 2 THEN (ssc - sc * sc / CAST(n_c AS DOUBLE))
             |      / (CAST(n_c AS DOUBLE) - 1.0) END AS vc
             |  FROM c),
             |d AS (SELECT period, n_t, n_c, mean_t, mean_c,
             |    mean_t - mean_c AS diff,
             |    vt / CAST(n_t AS DOUBLE) + vc / CAST(n_c AS DOUBLE) AS se2
             |  FROM t),
             |d2 AS (SELECT *,
             |    CASE WHEN se2 > 0 THEN sqrt(se2) END AS se FROM d),
             |b AS (SELECT MIN(diff) AS bd, MIN(se2) AS bs2 FROM d2
             |  WHERE period = '1995'),
             |f AS (SELECT d2.*, b.bd, b.bs2 FROM d2 CROSS JOIN b)
             |SELECT period, n_t, n_c, mean_t, mean_c, diff, se,
             |  CASE WHEN se > 0 THEN diff / se END AS z,
             |  CASE WHEN period = '1995' THEN 0.0
             |    ELSE diff - bd END AS rel_effect,
             |  CASE WHEN period <> '1995' AND se2 IS NOT NULL
             |    AND bs2 IS NOT NULL AND (se2 + bs2) > 0
             |    THEN sqrt(se2 + bs2) END AS rel_se,
             |  CASE WHEN period <> '1995' AND se2 IS NOT NULL
             |    AND bs2 IS NOT NULL AND (se2 + bs2) > 0
             |    AND sqrt(se2 + bs2) > 0
             |    THEN (diff - bd) / sqrt(se2 + bs2) END AS rel_z
             |FROM f ORDER BY period""".stripMargin))
  )
}
