package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 68 (round 16, session 2): chi-square cell
  * residuals — the "which cells drive the association" follow-up to
  * the omnibus χ²/Cramér's V gauges.
  */
private[graft] object Batch68 {

  val queries: Seq[Q] = Seq(

    // Adjusted residuals of event_type x day-of-week: every cell of
    // the level spine (zero cells included), expected counts, and
    // both residual forms replayed.
    Q("q399_chisq_residuals",
      (s, dir) => graft.operators.Analytics.chiSquareResiduals(
        Tables.events(s, dir)
          .withColumn("dow", expr("(ts div 86400000000000) % 7")),
        "event_type", "dow")
        .orderBy("event_type", "dow"),
      Some("""WITH base AS (SELECT event_type AS a,
             |    (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 % 7 AS b
             |  FROM events WHERE event_type IS NOT NULL),
             |cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM base GROUP BY 1, 2),
             |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
             |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
             |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
             |sp AS (SELECT ra.a, cb.b, ra.r, cb.c, n.n
             |  FROM ra CROSS JOIN cb CROSS JOIN n),
             |j AS (SELECT sp.a, sp.b, sp.r, sp.c, sp.n,
             |    CAST(COALESCE(cells.o, 0) AS BIGINT) AS observed
             |  FROM sp LEFT JOIN cells ON sp.a = cells.a AND sp.b = cells.b),
             |e AS (SELECT a, b, observed,
             |    CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
             |    CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS rs,
             |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS cs
             |  FROM j)
             |SELECT a AS event_type, b AS dow, observed, expected,
             |  CASE WHEN expected > 0
             |    THEN (CAST(observed AS DOUBLE) - expected) / SQRT(expected) END AS pearson_resid,
             |  CASE WHEN expected * (1.0 - rs) * (1.0 - cs) > 0
             |    THEN (CAST(observed AS DOUBLE) - expected)
             |      / SQRT(expected * (1.0 - rs) * (1.0 - cs)) END AS adj_resid
             |FROM e ORDER BY event_type, dow""".stripMargin))
  )
}
