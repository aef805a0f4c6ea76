package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 31 (round 12): sketch-ECDF KS — the
  * unbounded-cardinality scale path the ksTest scaladoc promised.
  */
private[graft] object Batch31 {

  val queries: Seq[Q] = Seq(

    // Sketch-ECDF KS on the q217 fixture, gated by the EXACT oracle
    // (the q43/q128 estimator-gate pattern, strongest form): with
    // k = 2048 far above the per-group distinct-value count (≤ ~700 at
    // any driver SF — floored purchase values), neither KHist sketch
    // ever compresses, every centroid is an exact (value, count) pair,
    // and the driver-side walk reproduces ksTest's integer
    // cross-product argmax + single division BIT-FOR-BIT — so the whole
    // sketch path (mergeable aggregator, 2-row exchange, pooled-ECDF
    // walk) sits under the same exact SQL oracle as q217. Compression
    // behavior at small k is spec-bounded (AnalyticsSpec).
    Q("q225_ks_sketch",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.ksTestSketch(ev, "grp", "v",
          "ref", "cur", k = 2048)
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
             |  CAST(MIN(v) AS DOUBLE) AS d_at,
             |  CAST(MAX(m) AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d
             |FROM mx WHERE num = m GROUP BY na, nb""".stripMargin))
  )
}
