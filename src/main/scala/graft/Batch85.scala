package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 85 (round 19, continuation wave J): always-
  * valid confidence sequences — the error-bar duals of the mSPRT
  * e-process family (one-sample mean and the two-arm lift).
  */
private[graft] object Batch85 {

  val queries: Seq[Q] = Seq(

    // Always-valid mean confidence sequence over the q428 fixture (the
    // doc-id-ordered value stream with the +2.0 jump at doc_id 3000):
    // the same exact decimal(38,12) inclusive prefix, with the
    // inverted-mSPRT radius chain — V_n = sigma2/n, radius =
    // sqrt((V(V+tau2)/tau2)(ln((V+tau2)/V) - 2 ln alpha)) — replayed
    // term for term by DuckDB's cumulative window.
    Q("q470_mean_cs",
      (s, dir) => graft.operators.Analytics.meanConfidenceSequence(
        Tables.documents(s, dir).select(
          col("doc_id").as("t"),
          (pmod(col("doc_id") * 2654435761L, lit(1000L)).cast("double") /
            lit(100.0) +
            when(col("doc_id") >= 3000, lit(2.0)).otherwise(lit(0.0)))
            .as("v")),
        "t", "v", sigma2 = 8.0, tau2 = 0.5, alpha = 0.05),
      Some("""WITH b AS (SELECT doc_id AS t,
             |    CAST((doc_id * 2654435761) % 1000 AS DOUBLE) / 100.0
             |      + CASE WHEN doc_id >= 3000 THEN 2.0 ELSE 0.0 END AS v
             |  FROM documents),
             |c AS (SELECT t,
             |    CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS n,
             |    SUM(CAST(v AS DECIMAL(38,12))) OVER
             |      (ORDER BY t ROWS UNBOUNDED PRECEDING) AS s
             |  FROM b),
             |m AS (SELECT t, n,
             |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
             |    8.0 / CAST(n AS DOUBLE) AS vt FROM c),
             |r AS (SELECT t, n, mean_v,
             |    SQRT((vt * (vt + 0.5) / 0.5) *
             |      (LN((vt + 0.5) / vt) - 2.0 * LN(0.05))) AS radius
             |  FROM m)
             |SELECT t, n, mean_v, radius,
             |  mean_v - radius AS ci_lo, mean_v + radius AS ci_hi
             |FROM r ORDER BY t""".stripMargin)),

    // Two-arm lift confidence sequence over the q437 fixture (the
    // hash-split purchase stream with the +25 bump on every 5th B
    // event): four per-arm prefix weights, V_t = sigma2(1/n_a + 1/n_b),
    // the same inverted radius, NULL until both arms report.
    Q("q471_diff_cs",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ms2") <
              2147483648L, "a").otherwise("b"))
          .withColumn("v",
            when(col("grp") === "b" && col("event_id") % 5 === 0,
              col("value") + 25.0).otherwise(col("value")))
        graft.operators.Analytics.diffConfidenceSequence(ev, "event_id",
          "grp", "v", "a", "b", sigma2 = 8000.0, tau2 = 400.0,
          alpha = 0.05)
      },
      Some("""WITH g AS (SELECT event_id AS t,
             |    CASE WHEN CAST('0x' || substr(md5('ms2' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 1 ELSE 0 END AS ia,
             |    value FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |p AS (SELECT t, ia,
             |    CASE WHEN ia = 0 AND t % 5 = 0 THEN value + 25.0
             |      ELSE value END AS v FROM g),
             |c AS (SELECT t, ia,
             |    CAST(SUM(ia) OVER w AS BIGINT) AS n_a,
             |    CAST(SUM(1 - ia) OVER w AS BIGINT) AS n_b,
             |    SUM(CASE WHEN ia = 1 THEN CAST(v AS DECIMAL(38,12))
             |      ELSE CAST(0 AS DECIMAL(38,12)) END) OVER w AS sa,
             |    SUM(CASE WHEN ia = 0 THEN CAST(v AS DECIMAL(38,12))
             |      ELSE CAST(0 AS DECIMAL(38,12)) END) OVER w AS sb
             |  FROM p WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT t, n_a, n_b,
             |    CASE WHEN n_a > 0
             |      THEN CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0
             |      THEN CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
             |    END AS vt
             |  FROM c),
             |r AS (SELECT t, n_a, n_b, mean_a, mean_b,
             |    mean_a - mean_b AS diff,
             |    CASE WHEN vt IS NOT NULL THEN
             |      SQRT((vt * (vt + 400.0) / 400.0) *
             |        (LN((vt + 400.0) / vt) - 2.0 * LN(0.05)))
             |    END AS radius FROM m)
             |SELECT t, n_a, n_b, mean_a, mean_b, diff, radius,
             |  diff - radius AS ci_lo, diff + radius AS ci_hi
             |FROM r ORDER BY t""".stripMargin))
  )
}
