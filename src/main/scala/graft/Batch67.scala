package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 67 (round 16, session 2): the calibration
  * TEST pair (Spiegelhalter's Z beside q285's ECE estimate, the exact
  * Murphy decomposition of the Brier score) and Neyman allocation for
  * stratified eval-set sizing.
  */
private[graft] object Batch67 {

  val queries: Seq[Q] = Seq(

    // Spiegelhalter's Z on q285's deliberately miscalibrated fixture
    // (p = value/200 vs label value>55): the binning-free significance
    // test - both pinned term sums and the z replayed.
    Q("q396_spiegelhalter",
      (s, dir) => graft.functions.ML.spiegelhalterZ(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("p", least(col("value") / 200, lit(1.0))),
        "p", col("value") > 55),
      Some("""WITH s AS (SELECT LEAST(value / 200, 1.0) AS p,
             |    CASE WHEN value > 55 THEN 1.0 ELSE 0.0 END AS y
             |  FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COALESCE(SUM(CAST((y - p) * (1.0 - 2.0 * p) AS DECIMAL(28,12))), 0) AS DOUBLE) AS num,
             |    CAST(COALESCE(SUM(CAST((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p * (1.0 - p) AS DECIMAL(28,12))), 0) AS DOUBLE) AS var
             |  FROM s)
             |SELECT n, num, var,
             |  CASE WHEN var > 0 THEN num / SQRT(var) END AS z
             |FROM a""".stripMargin)),

    // Murphy decomposition over DISTINCT forecast values (where the
    // identity brier = rel - res + unc is exact): same fixture - the
    // reliability share of the q285 Brier is the miscalibration.
    Q("q397_brier_decomp",
      (s, dir) => graft.functions.ML.brierDecomposition(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("p", least(col("value") / 200, lit(1.0))),
        "p", col("value") > 55),
      Some("""WITH s AS (SELECT LEAST(value / 200, 1.0) AS p,
             |    CASE WHEN value > 55 THEN 1.0 ELSE 0.0 END AS y
             |  FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             |    CAST(COALESCE(SUM(CAST((p - y) * (p - y) AS DECIMAL(28,12))), 0) AS DOUBLE) AS sbr
             |  FROM s),
             |cells AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS nk,
             |    CAST(SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS posk
             |  FROM s GROUP BY 1),
             |f AS (SELECT tot.n, tot.sbr, tot.pos,
             |    CAST(COALESCE(SUM(CAST((CAST(nk AS DOUBLE) / CAST(tot.n AS DOUBLE))
             |      * (p - CAST(posk AS DOUBLE) / CAST(nk AS DOUBLE))
             |      * (p - CAST(posk AS DOUBLE) / CAST(nk AS DOUBLE)) AS DECIMAL(28,12))), 0) AS DOUBLE) AS reliability,
             |    CAST(COALESCE(SUM(CAST((CAST(nk AS DOUBLE) / CAST(tot.n AS DOUBLE))
             |      * (CAST(posk AS DOUBLE) / CAST(nk AS DOUBLE) - CAST(tot.pos AS DOUBLE) / CAST(tot.n AS DOUBLE))
             |      * (CAST(posk AS DOUBLE) / CAST(nk AS DOUBLE) - CAST(tot.pos AS DOUBLE) / CAST(tot.n AS DOUBLE)) AS DECIMAL(28,12))), 0) AS DOUBLE) AS resolution
             |  FROM cells, tot GROUP BY tot.n, tot.sbr, tot.pos)
             |SELECT n,
             |  CASE WHEN n > 0 THEN sbr / CAST(n AS DOUBLE) END AS brier,
             |  reliability, resolution,
             |  (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
             |    * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) AS uncertainty
             |FROM f""".stripMargin)),

    // Neyman allocation of a 1000-sample eval budget across event
    // types: exact per-stratum moments, N_h*S_h weights, the pinned
    // allocation chain - proportional-to-size would over-sample the
    // low-variance strata.
    Q("q398_neyman",
      (s, dir) => graft.functions.Sampling.neymanAllocation(
        Tables.events(s, dir).select("event_type", "value"),
        Seq("event_type"), "value", total = 1000L)
        .orderBy("event_type"),
      Some("""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pop,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv
             |  FROM events WHERE value IS NOT NULL GROUP BY 1),
             |w AS (SELECT event_type, n_pop,
             |    CASE WHEN n_pop >= 2
             |      THEN SQRT(GREATEST((svv - sv * sv / CAST(n_pop AS DOUBLE))
             |        / (CAST(n_pop AS DOUBLE) - 1.0), 0.0)) END AS sd
             |  FROM g),
             |w2 AS (SELECT event_type, n_pop, sd,
             |    COALESCE(CAST(n_pop AS DOUBLE) * sd, 0.0) AS weight FROM w),
             |t AS (SELECT CAST(SUM(CAST(weight AS DECIMAL(28,12))) AS DOUBLE) AS w FROM w2)
             |SELECT event_type, n_pop, sd, weight,
             |  CASE WHEN t.w > 0 THEN 1000.0 * weight / t.w END AS alloc
             |FROM w2, t ORDER BY event_type""".stripMargin))
  )
}
