package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 60 (round 16, session 2): stratified and
  * repeated-measures tests — Cochran–Mantel–Haenszel (confounder-
  * controlled 2×2), Friedman (within-block k-treatment ranks), and
  * Cochran's Q (k binary treatments, same subjects).
  */
private[graft] object Batch60 {

  val queries: Seq[Q] = Seq(

    // CMH across day-of-week strata: does clicking associate with
    // high value once stratified by day - per-stratum hypergeometric
    // E/V and the MH pooled OR, every term replayed.
    Q("q378_cmh",
      (s, dir) => graft.operators.Analytics.cmhTest(
        Tables.events(s, dir)
          .withColumn("dow", expr("(ts div 86400000000000) % 7")),
        Seq("dow"), col("event_type") === "click", col("value") > 100),
      Some("""WITH cell AS (SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 % 7 AS dow,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND NOT (value > 100) THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(SUM(CASE WHEN NOT (event_type = 'click') AND value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(SUM(CASE WHEN NOT (event_type = 'click') AND NOT (value > 100) THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM events GROUP BY 1),
             |t AS (SELECT dow, a, b, c, d, a + b + c + d AS n FROM cell),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_strata,
             |    CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(a) AS BIGINT) AS o_a,
             |    CAST(SUM(CAST(CASE WHEN n > 0
             |      THEN CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) / CAST(n AS DOUBLE)
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS e_a,
             |    CAST(SUM(CAST(CASE WHEN n > 1
             |      THEN CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
             |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS v,
             |    CAST(SUM(CAST(CASE WHEN n > 0
             |      THEN CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS r,
             |    CAST(SUM(CAST(CASE WHEN n > 0
             |      THEN CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS sx
             |  FROM t)
             |SELECT k_strata, n, o_a, e_a, v,
             |  CASE WHEN sx > 0 THEN r / sx END AS or_mh,
             |  CASE WHEN v > 0 THEN
             |    GREATEST(ABS(CAST(o_a AS DOUBLE) - e_a) - 0.5, 0.0)
             |      * GREATEST(ABS(CAST(o_a AS DOUBLE) - e_a) - 0.5, 0.0) / v
             |  END AS chi2
             |FROM agg""".stripMargin)),

    // Friedman over 20 user-bucket blocks x 5 event-type treatments
    // (mean value per cell): within-block mid-ranks on the keyed
    // prefix, exact rank-sum squares, tie-corrected chi2 = b(k-1)W.
    Q("q379_friedman",
      (s, dir) => {
        val cell = Tables.events(s, dir)
          .groupBy(pmod(col("user_id"), lit(20L)).as("b"),
            col("event_type").as("t"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        graft.operators.Analytics.friedmanTest(cell, "b", "t", "v")
      },
      Some("""WITH cell AS (SELECT user_id % 20 AS b, event_type AS t,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cell),
             |per AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS kt FROM cell GROUP BY 1),
             |keptb AS (SELECT per.b FROM per, k WHERE per.kt = k.k),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded FROM per, k WHERE per.kt <> k.k),
             |kept AS (SELECT cell.* FROM cell JOIN keptb ON cell.b = keptb.b),
             |m AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS m FROM kept),
             |vt AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS tc FROM kept GROUP BY 1, 2),
             |cum AS (SELECT b, v, tc,
             |    COALESCE(SUM(tc) OVER (PARTITION BY b ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM vt),
             |ranked AS (SELECT k2.t AS tr, 2 * cum.bef + cum.tc + 1 AS r2
             |  FROM kept k2 JOIN cum ON k2.b = cum.b AND k2.v = cum.v),
             |ties AS (SELECT COALESCE(SUM(CAST(tc AS DECIMAL(38,0)) * CAST(tc AS DECIMAL(38,0)) * CAST(tc AS DECIMAL(38,0)) - CAST(tc AS DECIMAL(38,0))), 0) AS tj FROM vt),
             |tr AS (SELECT tr, SUM(r2) AS r2j FROM ranked GROUP BY 1),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS kt,
             |    COALESCE(SUM(CAST(r2j AS DECIMAL(38,0)) * CAST(r2j AS DECIMAL(38,0))), 0) AS sr2
             |  FROM tr),
             |f AS (SELECT m.m, agg.kt, exc.n_excluded,
             |    12.0 * CAST(sr2 AS DOUBLE) / 4.0
             |      - 3.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE) * CAST(kt AS DOUBLE)
             |        * (CAST(kt AS DOUBLE) + 1.0) * (CAST(kt AS DOUBLE) + 1.0) AS num,
             |    CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE) * CAST(kt AS DOUBLE)
             |      * (CAST(kt AS DOUBLE) * CAST(kt AS DOUBLE) - 1.0)
             |      - CAST(m.m AS DOUBLE) * CAST(ties.tj AS DOUBLE) AS den
             |  FROM m, agg, exc, ties)
             |SELECT m AS n_blocks, kt AS k_treatments, n_excluded,
             |  CASE WHEN den > 0 THEN num / den END AS w,
             |  CASE WHEN den > 0 THEN CAST(m AS DOUBLE) * (CAST(kt AS DOUBLE) - 1.0) * (num / den) END AS chi2,
             |  kt - 1 AS dof
             |FROM f""".stripMargin)),

    // Cochran's Q over 200 user-bucket subjects x 5 event-type
    // treatments, success = any value > 150 in the cell: exact integer
    // chain, subjects missing a treatment excluded and counted.
    Q("q380_cochran_q",
      (s, dir) => graft.operators.Analytics.cochranQ(
        Tables.events(s, dir)
          .withColumn("subj", pmod(col("user_id"), lit(200L))),
        "subj", "event_type", col("value") > 150),
      Some("""WITH cell AS (SELECT user_id % 200 AS s, event_type AS t,
             |    CAST(MAX(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT) AS x
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cell),
             |per AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS kt,
             |    CAST(SUM(x) AS BIGINT) AS ri FROM cell GROUP BY 1),
             |kept AS (SELECT per.* FROM per, k WHERE per.kt = k.k),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded
             |  FROM per, k WHERE per.kt <> k.k),
             |ragg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             |    COALESCE(SUM(ri), 0) AS tt,
             |    COALESCE(SUM(CAST(ri AS DECIMAL(38,0)) * ri), 0) AS sr2
             |  FROM kept),
             |cagg AS (SELECT COALESCE(SUM(CAST(cj AS DECIMAL(38,0)) * cj), 0) AS sc2
             |  FROM (SELECT cell.t, CAST(SUM(cell.x) AS BIGINT) AS cj
             |    FROM cell JOIN kept ON cell.s = kept.s GROUP BY 1)),
             |f AS (SELECT ragg.n_subjects, exc.n_excluded, k.k,
             |    (CAST(k.k AS DOUBLE) - 1.0)
             |      * (CAST(k.k AS DOUBLE) * CAST(sc2 AS DOUBLE)
             |        - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)) AS num,
             |    CAST(k.k AS DOUBLE) * CAST(tt AS DOUBLE) - CAST(sr2 AS DOUBLE) AS den
             |  FROM ragg, exc, k, cagg)
             |SELECT n_subjects, n_excluded, k,
             |  CASE WHEN den > 0 THEN num / den END AS q_stat,
             |  k - 1 AS dof
             |FROM f""".stripMargin))
  )
}
