package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 81 (round 18, wave 7): completing the
  * multiple-testing shelf — Storey's adaptive q-values and Fisher's
  * combined probability test.
  */
private[graft] object Batch81 {

  val queries: Seq[Q] = Seq(

    // Storey q-values over q315's deterministic per-user p table
    // (ties, ~9% NULLs): the tail-share pi0 estimate, the distinct-p
    // rank, the suffix-min, the pi0 scaling BEFORE the cap, and the
    // join-back are all replayed by DuckDB windows.
    Q("q445_storey_qvalue",
      (s, dir) => {
        val hyp = Tables.events(s, dir)
          .select(col("user_id")).distinct()
          .withColumn("p",
            when(col("user_id") % 97 =!= 0,
              ((col("user_id") * 2654435761L) % 1009L).cast("double")
                / 1009.0))
        graft.operators.Analytics.storeyQValue(hyp, "p", lambda = 0.5)
          .orderBy("user_id")
      },
      Some("""WITH hyp AS (SELECT DISTINCT user_id FROM events),
             |h AS (SELECT user_id, CASE WHEN user_id % 97 <> 0
             |    THEN CAST((user_id * 2654435761) % 1009 AS DOUBLE) / 1009.0
             |    END AS p FROM hyp),
             |dp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM h WHERE p IS NOT NULL GROUP BY p),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS m,
             |    CAST(COALESCE(SUM(CASE WHEN p > 0.5 THEN c ELSE 0 END), 0) AS BIGINT) AS ntail
             |  FROM dp),
             |pi AS (SELECT m, LEAST(1.0,
             |    CAST(ntail AS DOUBLE) / (0.5 * CAST(m AS DOUBLE))) AS pi0
             |  FROM n),
             |r AS (SELECT p, CAST(SUM(c) OVER
             |    (ORDER BY p ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rk
             |  FROM dp),
             |q AS (SELECT p,
             |    CAST(p AS DOUBLE) * CAST(m AS DOUBLE) / CAST(rk AS DOUBLE) AS q
             |  FROM r CROSS JOIN pi),
             |sm AS (SELECT p, MIN(q) OVER
             |    (ORDER BY p DESC ROWS UNBOUNDED PRECEDING) AS rmin FROM q),
             |adj AS (SELECT p, pi.pi0,
             |    LEAST(1.0, pi.pi0 * rmin) AS q_value
             |  FROM sm CROSS JOIN pi)
             |SELECT h.user_id, h.p, adj.pi0, adj.q_value
             |FROM h LEFT JOIN adj ON h.p = adj.p
             |ORDER BY h.user_id""".stripMargin)),

    // Fisher's combined test over a deterministic per-user p slice
    // (p in (0,1] by construction, NULLs every 13th user counted):
    // each ln p term quantized at scale 12, the exact decimal sum,
    // and the -2x chain replayed by DuckDB.
    Q("q446_fisher_combine",
      (s, dir) => {
        val hyp = Tables.events(s, dir)
          .select(col("user_id")).distinct()
          .withColumn("p",
            when(col("user_id") % 13 =!= 0,
              ((col("user_id") * 2654435761L) % 997L + 1L).cast("double")
                / 997.0))
        graft.operators.Analytics.fisherCombine(hyp, "p")
      },
      Some("""WITH hyp AS (SELECT DISTINCT user_id FROM events),
             |h AS (SELECT user_id, CASE WHEN user_id % 13 <> 0
             |    THEN CAST((user_id * 2654435761) % 997 + 1 AS DOUBLE) / 997.0
             |    END AS p FROM hyp),
             |s AS (SELECT
             |    CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k,
             |    CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |    CAST(SUM(CASE WHEN p IS NOT NULL AND p > 0 AND p <= 1
             |      THEN CAST(LN(p) AS DECIMAL(28,12)) END) AS DOUBLE) AS sl
             |  FROM h)
             |SELECT k, n_null,
             |  CASE WHEN k > 0 THEN -2.0 * sl END AS chi2,
             |  k * 2 AS dof
             |FROM s""".stripMargin))
  )
}
