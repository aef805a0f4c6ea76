package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 96 (round 19, continuation wave V): the
  * per-segment SRM sweep and the uplift (Qini) curve.
  */
private[graft] object Batch96 {

  val queries: Seq[Q] = Seq(

    // Per-segment SRM over event types with a split DELIBERATELY
    // broken in the 'view' segment only (hash threshold 0.6 there,
    // 0.5 elsewhere): the broken segment's chi2 screams in its own
    // row while the other segments read healthy - the dilution case
    // the global test misses.
    Q("q487_srm_by",
      (s, dir) => graft.operators.Analytics.srmTestBy(
        Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "srmb") <
              when(col("event_type") === "view", lit(2576980378L))
                .otherwise(lit(2147483648L)), "a").otherwise("b")),
        Seq("event_type"), "grp", Seq("a" -> 0.5, "b" -> 0.5)),
      Some("""WITH g AS (SELECT event_type,
             |    CASE WHEN CAST('0x' || substr(md5('srmb' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < CASE WHEN event_type = 'view' THEN 2576980378
             |        ELSE 2147483648 END
             |      THEN 'a' ELSE 'b' END AS grp
             |  FROM events),
             |c AS (SELECT event_type,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS oa,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS ob,
             |    CAST(SUM(CASE WHEN grp IN ('a', 'b') THEN 0 ELSE 1 END) AS BIGINT) AS n_other
             |  FROM g GROUP BY 1)
             |SELECT event_type, oa + ob AS n, n_other,
             |  CAST(2 AS BIGINT) AS k,
             |  CASE WHEN oa + ob > 0 THEN
             |    (CAST(oa AS DOUBLE) - CAST(oa + ob AS DOUBLE) * 0.5)
             |      * (CAST(oa AS DOUBLE) - CAST(oa + ob AS DOUBLE) * 0.5)
             |      / (CAST(oa + ob AS DOUBLE) * 0.5)
             |    + (CAST(ob AS DOUBLE) - CAST(oa + ob AS DOUBLE) * 0.5)
             |      * (CAST(ob AS DOUBLE) - CAST(oa + ob AS DOUBLE) * 0.5)
             |      / (CAST(oa + ob AS DOUBLE) * 0.5)
             |  END AS chi2,
             |  CAST(1 AS BIGINT) AS dof
             |FROM c ORDER BY event_type""".stripMargin)),

    // Qini curve for a synthetic uplift model over documents: score
    // si = (doc_id*7919) % 50, hash-split arms, and an outcome whose
    // TREATED conversion rises with the score (si div 2 extra points)
    // while control stays flat - so the curve must clear the random
    // diagonal early. Distinct-score descending cumulative, exact
    // decimal outcome sums, broadcast totals row; every point
    // replayed by DuckDB's window.
    Q("q488_uplift_curve",
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
        graft.operators.Analytics.upliftCurve(d0, "score", "grp", "y",
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
             |f AS (SELECT cum.*, tot.* FROM cum CROSS JOIN tot)
             |SELECT score, n_t + n_c AS n, n_t, n_c,
             |  CAST(cyt AS DOUBLE) AS y_t, CAST(cyc AS DOUBLE) AS y_c,
             |  CASE WHEN n_c > 0 THEN CAST(cyt AS DOUBLE)
             |    - CAST(cyc AS DOUBLE) * CAST(n_t AS DOUBLE) / CAST(n_c AS DOUBLE)
             |  END AS qini,
             |  CAST(n_t + n_c AS DOUBLE) / CAST(tnt + tnc AS DOUBLE) *
             |    (CASE WHEN tnc > 0 THEN tyt
             |      - tyc * CAST(tnt AS DOUBLE) / CAST(tnc AS DOUBLE) END)
             |    AS qini_random
             |FROM f ORDER BY score DESC""".stripMargin))
  )
}
