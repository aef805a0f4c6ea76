package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 98 (round 19, continuation wave Y): the AUUC
  * scalar for the Qini curve and the duplication profile report.
  */
private[graft] object Batch98 {

  val queries: Seq[Q] = Seq(

    // AUUC over the q488 uplift fixture: origin-anchored trapezoids
    // via the predecessor equi-join (exclusive count = previous
    // inclusive count), terms quantized at scale 18, the random
    // triangle q_total/2 beside it - replayed by DuckDB's LAG.
    Q("q490_qini_auc",
      (s, dir) => {
        val d0 = Tables.documents(s, dir)
          .withColumn("si", pmod(col("doc_id") * 7919L, lit(50L)))
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("doc_id"), "up") <
              2147483648L, "T").otherwise("C"))
          .withColumn("y",
            (pmod(col("doc_id") * 104729L, lit(100L)) <
              lit(20L) + when(col("grp") === "T",
                expr("si div 2")).otherwise(lit(2L))).cast("int"))
          .withColumn("score", col("si").cast("double"))
        graft.operators.Analytics.qiniAuc(d0, "score", "grp", "y",
          "T", "C")
      },
      Some("""WITH b AS (SELECT (doc_id * 7919) % 50 AS si,
             |    CASE WHEN CAST('0x' || substr(md5('up' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'T' ELSE 'C' END AS grp,
             |    doc_id FROM documents),
             |u AS (SELECT CAST(si AS DOUBLE) AS score, grp,
             |    CASE WHEN (doc_id * 104729) % 100 <
             |      20 + CASE WHEN grp = 'T' THEN si // 2 ELSE 2 END
             |      THEN 1 ELSE 0 END AS y FROM b),
             |sc AS (SELECT score,
             |    CAST(SUM(CASE WHEN grp = 'T' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
             |    CAST(SUM(CASE WHEN grp = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             |    SUM(CASE WHEN grp = 'T' THEN CAST(y AS DECIMAL(18,4))
             |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS yt,
             |    SUM(CASE WHEN grp = 'C' THEN CAST(y AS DECIMAL(18,4))
             |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS yc
             |  FROM u GROUP BY 1),
             |cum AS (SELECT score,
             |    CAST(SUM(nt) OVER w AS BIGINT) AS n_t,
             |    CAST(SUM(nc) OVER w AS BIGINT) AS n_c,
             |    SUM(yt) OVER w AS cyt, SUM(yc) OVER w AS cyc
             |  FROM sc WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)),
             |tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS tnt,
             |    CAST(SUM(nc) AS BIGINT) AS tnc,
             |    CAST(SUM(yt) AS DOUBLE) AS tyt,
             |    CAST(SUM(yc) AS DOUBLE) AS tyc FROM sc),
             |f AS (SELECT cum.n_t + cum.n_c AS n,
             |    CASE WHEN cum.n_c > 0 THEN CAST(cum.cyt AS DOUBLE)
             |      - CAST(cum.cyc AS DOUBLE) * CAST(cum.n_t AS DOUBLE) / CAST(cum.n_c AS DOUBLE)
             |    END AS qini,
             |    tot.tnt + tot.tnc AS nn,
             |    CASE WHEN tot.tnc > 0 THEN tot.tyt
             |      - tot.tyc * CAST(tot.tnt AS DOUBLE) / CAST(tot.tnc AS DOUBLE)
             |    END AS qtot
             |  FROM cum CROSS JOIN tot),
             |lagd AS (SELECT n, qini, nn, qtot,
             |    COALESCE(LAG(n) OVER (ORDER BY n), 0) AS nprev,
             |    LAG(qini) OVER (ORDER BY n) AS bq
             |  FROM f),
             |t AS (SELECT n, qini, nn, qtot,
             |    CAST((CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
             |        - CAST(nprev AS DOUBLE) / CAST(nn AS DOUBLE)) *
             |      (qini + CASE WHEN nprev = 0 THEN 0.0 ELSE bq END)
             |      / 2.0 AS DECIMAL(38,18)) AS term
             |  FROM lagd),
             |a AS (SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS n_points,
             |    CAST(SUM(CASE WHEN qini IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_undefined,
             |    MAX(qtot) AS q_total,
             |    CAST(SUM(term) AS DOUBLE) AS area FROM t)
             |SELECT n, n_points, n_undefined, q_total,
             |  CASE WHEN n > 0 AND n_undefined = 0 THEN area END AS auuc,
             |  CASE WHEN n > 0 THEN q_total / 2.0 END AS auuc_random,
             |  CASE WHEN n > 0 AND n_undefined = 0
             |    THEN area - q_total / 2.0 END AS auuc_excess
             |FROM a""".stripMargin)),

    // Duplication profile over documents with a planted re-ingest
    // (every 7th document appended again under a new id): cluster
    // sizes on exact()'s own sha2(normalized text) digest, the
    // per-size corpus shares, and what exact dedup would remove.
    Q("q491_dup_profile",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val planted = docs.select(col("doc_id"), col("text"))
          .union(docs.filter(pmod(col("doc_id"), lit(7L)) === 0)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        graft.functions.Dedup.dupProfile(planted, "text")
      },
      Some("""WITH d0 AS (SELECT text FROM documents
             |  UNION ALL
             |  SELECT text FROM documents WHERE doc_id % 7 = 0),
             |cl AS (SELECT
             |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
             |    CAST(COUNT(*) AS BIGINT) AS sz
             |  FROM d0 WHERE text IS NOT NULL GROUP BY 1),
             |tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n FROM cl)
             |SELECT cl.sz AS copies,
             |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
             |  CAST(SUM(cl.sz) AS BIGINT) AS n_docs,
             |  CAST(SUM(cl.sz) AS DOUBLE) / CAST(tot.n AS DOUBLE) AS share_of_corpus,
             |  CAST((cl.sz - 1) * COUNT(*) AS DOUBLE) / CAST(tot.n AS DOUBLE) AS removable_share
             |FROM cl CROSS JOIN tot
             |GROUP BY cl.sz, tot.n ORDER BY copies""".stripMargin))
  )
}
