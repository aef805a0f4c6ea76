package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 46 (round 15, continued): the integral drift
  * statistic (exact 1-D Wasserstein-1, global + per-slice) beside the
  * sup statistic (ksTest), the parametric location test (Welch's t)
  * beside the rank one (Mann–Whitney), and probability-calibration
  * eval (Brier + ECE) beside the ranking eval (aucRoc/avgPrecision).
  */
private[graft] object Batch46 {

  val queries: Seq[Q] = Seq(

    // Exact W1 between a hash-split reference and a drifted current
    // slice on q217's fixture (values doubled for every third cur
    // event, floored to long so every CDF gap is integer-exact): dual
    // cumulatives + dense index from ONE distributed prefix, the
    // next-value equi-join, the |Fa−Fb|·gap terms, and the decimal sum
    // all replayed. The ×2 tail stretch is exactly the drift W1 is
    // built for: mass moved FAR counts in proportion to distance.
    Q("q281_wasserstein1",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.wasserstein1(ev, "grp", "v", "ref", "cur")
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
             |    LEAD(v) OVER (ORDER BY v) AS nv,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
             |  FROM c),
             |t AS (SELECT na, nb,
             |    CAST((CAST(ABS(CAST(cuma AS DECIMAL(38,0)) * nb
             |          - CAST(cumb AS DECIMAL(38,0)) * na) AS DOUBLE)
             |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             |      * (CAST(nv AS DOUBLE) - CAST(v AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM cum WHERE nv IS NOT NULL)
             |SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0
             |    THEN CAST(COALESCE(SUM(term), 0) AS DOUBLE) END AS w1
             |FROM t""".stripMargin)),

    // Per-event-type W1 on q274's fixture (ONLY the 'view' slice
    // shifted ×1.5): the sliced integral drift — the shifted slice's
    // w1 must stand far above the unshifted slices' sampling noise.
    // Keyed prefix, per-group next-value join, keyed totals spine.
    Q("q282_wasserstein1_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.wasserstein1By(ev, Seq("event_type"),
          "grp", "v", "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    value
             |  FROM events),
             |vals AS (SELECT event_type, grp,
             |    CAST(FLOOR(CASE WHEN grp = 'cur' AND event_type = 'view'
             |      THEN value * 1.5 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT event_type, v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1, 2),
             |cum AS (SELECT event_type, v,
             |    SUM(ca) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    LEAD(v) OVER (PARTITION BY event_type ORDER BY v) AS nv,
             |    SUM(ca) OVER (PARTITION BY event_type) AS na,
             |    SUM(cb) OVER (PARTITION BY event_type) AS nb
             |  FROM c),
             |t AS (SELECT event_type, na, nb,
             |    CAST((CAST(ABS(CAST(cuma AS DECIMAL(38,0)) * nb
             |          - CAST(cumb AS DECIMAL(38,0)) * na) AS DOUBLE)
             |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             |      * (CAST(nv AS DOUBLE) - CAST(v AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM cum WHERE nv IS NOT NULL)
             |SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_a,
             |  CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0
             |    THEN CAST(COALESCE(SUM(term), 0) AS DOUBLE) END AS w1
             |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin))
  )
}
