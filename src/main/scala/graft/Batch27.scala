package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 27 (round 11, sixth session, wave 18):
  * rank-based exact statistics — Kolmogorov–Smirnov and AUC-ROC.
  */
private[graft] object Batch27 {

  val queries: Seq[Q] = Seq(

    // Two-sample KS on purchase values between a hash-split reference
    // and a DRIFTED current slice (values doubled for every third
    // event): cumulative counts, the integer cross-product argmax, the
    // deterministic location, and the final division all replayed.
    // floor(value) forces ties so the tie machinery is under the gate.
    Q("q217_ks_test",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.ksTest(ev, "grp", "v", "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CAST(FLOOR(CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY v),
             |cum AS (SELECT v,
             |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
             |  FROM c),
             |num AS (SELECT v, na, nb,
             |    ABS(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na) AS num
             |  FROM cum),
             |mx AS (SELECT v, na, nb, num, MAX(num) OVER () AS m FROM num)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  MIN(v) AS d_at,
             |  CAST(MAX(m) AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d
             |FROM mx WHERE num = m GROUP BY na, nb""".stripMargin)),

    // Exact AUC-ROC of a weak heuristic score against a weak label:
    // floor(value/10) as the score (heavy ties) vs label value > 55 —
    // positively associated by construction, so AUC lands strictly
    // inside (0.5, 1) and the average-rank tie handling decides the
    // digits. Counts, rank sums, and the division all replayed.
    Q("q218_auc_roc",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("score", floor(col("value") / 10).cast("long"))
        graft.functions.ML.aucRoc(ev, "score", col("value") > 55)
      },
      Some("""WITH s AS (SELECT CAST(FLOOR(value / 10) AS BIGINT) AS score,
             |    value > 55 AS lab
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT score,
             |    CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             |    CAST(COUNT(*) AS BIGINT) AS tot
             |  FROM s GROUP BY score),
             |r AS (SELECT score, pos, tot,
             |    COALESCE(SUM(tot) OVER (ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM c)
             |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             |  CAST(SUM(tot) - SUM(pos) AS BIGINT) AS n_neg,
             |  CAST(SUM(CAST(pos AS DECIMAL(38,0)) * (2 * bef + tot + 1))
             |      - CAST(SUM(pos) AS DECIMAL(38,0)) * (SUM(pos) + 1) AS DOUBLE)
             |    / (2.0 * CAST(SUM(pos) AS DOUBLE) * CAST(SUM(tot) - SUM(pos) AS DOUBLE)) AS auc
             |FROM r""".stripMargin))
  )
}
