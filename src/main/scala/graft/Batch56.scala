package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 56 (round 16, session 2): the survival family
  * completed (Nelson–Aalen cumulative hazard, two-group log-rank test
  * beside q326's Kaplan–Meier) and the energy-distance drift statistic
  * (global + sliced) — the moment-free member beside the ECDF trio.
  */
private[graft] object Batch56 {

  val queries: Seq[Q] = Seq(

    // Nelson-Aalen cumulative hazard on q326's time-to-first-purchase
    // fixture (hours since first activity, non-purchasers censored at
    // last activity): at-risk prefix, 1e-12-quanta hazard/variance
    // accumulation - every step replayed by DuckDB windows.
    Q("q362_nelson_aalen",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val per = e.groupBy("user_id")
          .agg(min("ts").as("t0"), max("ts").as("t1"))
        val p = e.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("tp"))
        val subj = per.join(p, Seq("user_id"), "left")
          .select(
            when(col("tp").isNotNull,
              expr("(tp - t0) div 3600000000000"))
              .otherwise(expr("(t1 - t0) div 3600000000000")).as("dur"),
            col("tp").isNotNull.as("ev"))
        graft.operators.Analytics.nelsonAalen(subj, "dur", col("ev"))
      },
      Some("""WITH per AS (SELECT user_id, MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
             |  FROM events GROUP BY 1),
             |p AS (SELECT user_id, MIN(epoch_us(ts)) AS tp FROM events
             |  WHERE event_type = 'purchase' GROUP BY 1),
             |subj AS (SELECT CASE WHEN p.tp IS NOT NULL
             |    THEN (p.tp - per.t0) // 3600000000
             |    ELSE (per.t1 - per.t0) // 3600000000 END AS dur,
             |    p.tp IS NOT NULL AS ev
             |  FROM per LEFT JOIN p ON per.user_id = p.user_id),
             |c AS (SELECT dur AS t,
             |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
             |    CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
             |  FROM subj GROUP BY 1),
             |n AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM c),
             |r AS (SELECT t, d, c,
             |    n.n - COALESCE(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS risk
             |  FROM c, n),
             |tm AS (SELECT t, d, c, risk,
             |    CASE WHEN d > 0
             |      THEN CAST(CAST(CAST(d AS DOUBLE) / CAST(risk AS DOUBLE) AS DECIMAL(28,12)) * 1000000000000 AS BIGINT)
             |      ELSE 0 END AS h,
             |    CASE WHEN d > 0
             |      THEN CAST(CAST(CAST(d AS DOUBLE) / (CAST(risk AS DOUBLE) * CAST(risk AS DOUBLE)) AS DECIMAL(28,12)) * 1000000000000 AS BIGINT)
             |      ELSE 0 END AS v
             |  FROM r),
             |cum AS (SELECT t, risk, d, c,
             |    SUM(h) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sh,
             |    SUM(v) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv
             |  FROM tm)
             |SELECT t, CAST(risk AS BIGINT) AS n_risk, d, c,
             |  CAST(sh AS DOUBLE) / 1e12 AS cum_hazard,
             |  CAST(sv AS DOUBLE) / 1e12 AS var_hazard
             |FROM cum WHERE d > 0 ORDER BY t""".stripMargin)),

    // Log-rank test view vs click with a +20 survival advantage
    // INJECTED into the click durations (the discriminating-fixture
    // discipline - identical distributions would put O-E near 0 and
    // the test would verify only the zero) and every third event
    // censored: hypergeometric O/E/V accumulated as pinned decimals.
    Q("q363_logrank",
      (s, dir) => graft.operators.Analytics.logRankTest(
        Tables.events(s, dir)
          .withColumn("dur", col("value").cast("double") +
            when(col("event_type") === "click", 20.0).otherwise(0.0)),
        "event_type", "dur", pmod(col("event_id"), lit(3L)) =!= 0L,
        "view", "click"),
      Some("""WITH subj AS (SELECT event_type AS g,
             |    CAST(value AS DOUBLE) +
             |      CASE WHEN event_type = 'click' THEN 20.0 ELSE 0.0 END AS dur,
             |    event_id % 3 <> 0 AS ev
             |  FROM events
             |  WHERE event_type IN ('view','click') AND value IS NOT NULL),
             |c AS (SELECT dur AS t,
             |    CAST(SUM(CASE WHEN g = 'view' AND ev THEN 1 ELSE 0 END) AS BIGINT) AS da,
             |    CAST(SUM(CASE WHEN g = 'view' AND NOT ev THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN g = 'click' AND ev THEN 1 ELSE 0 END) AS BIGINT) AS db,
             |    CAST(SUM(CASE WHEN g = 'click' AND NOT ev THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM subj GROUP BY 1),
             |tot AS (SELECT CAST(SUM(da + ca) AS BIGINT) AS na,
             |    CAST(SUM(db + cb) AS BIGINT) AS nb FROM c),
             |r AS (SELECT t, da, db, tot.na, tot.nb,
             |    tot.na - COALESCE(SUM(da + ca) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ra,
             |    tot.nb - COALESCE(SUM(db + cb) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rb
             |  FROM c, tot),
             |terms AS (SELECT na, nb, da, ra, rb,
             |    ra + rb AS nt, da + db AS dt FROM r),
             |agg AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |    CAST(SUM(da) AS BIGINT) AS o_a,
             |    CAST(SUM(CAST(CASE WHEN dt > 0
             |      THEN CAST(dt AS DOUBLE) * CAST(ra AS DOUBLE) / CAST(nt AS DOUBLE)
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS e_a,
             |    CAST(SUM(CAST(CASE WHEN dt > 0 AND nt > 1
             |      THEN CAST(dt AS DOUBLE) * CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE)
             |        * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
             |        / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1.0))
             |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS v
             |  FROM terms GROUP BY na, nb),
             |f AS (SELECT n_a, n_b, o_a, e_a, v,
             |    CASE WHEN n_a > 0 AND n_b > 0 AND v > 0
             |      THEN (CAST(o_a AS DOUBLE) - e_a) / SQRT(v) END AS z
             |  FROM agg)
             |SELECT n_a, n_b, o_a, e_a, v, z, z * z AS chi2 FROM f""".stripMargin)),

    // Energy distance on the q226 drift convention (click values
    // doubled on every third event): all three pair-distance means from
    // one distributed prefix via the sorted prefix-sum identity - the
    // 1e-12 value quanta, decimal(38,0) prefixes, and pinned
    // decimal(38,12) term sums replayed step for step.
    Q("q364_energy",
      (s, dir) => graft.operators.Analytics.energyDistance(
        Tables.events(s, dir).select(col("event_type"),
          (col("value") * when(col("event_type") === "click" &&
            col("event_id") % 3 === 0, 2.0).otherwise(1.0)).as("v")),
        "event_type", "v", "view", "click"),
      Some("""WITH vals AS (SELECT event_type AS g,
             |    CAST(value * CASE WHEN event_type = 'click' AND event_id % 3 = 0
             |      THEN 2.0 ELSE 1.0 END AS DOUBLE) AS v
             |  FROM events
             |  WHERE event_type IN ('view','click') AND value IS NOT NULL),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1),
             |q AS (SELECT v, ca, cb,
             |    CAST(CAST(v AS DECIMAL(28,12)) * 1000000000000 AS BIGINT) AS vq
             |  FROM c),
             |w AS (SELECT v, ca, cb, vq,
             |    COALESCE(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cuma,
             |    COALESCE(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
             |    COALESCE(SUM(CAST(vq AS DECIMAL(38,0)) * ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sa,
             |    COALESCE(SUM(CAST(vq AS DECIMAL(38,0)) * cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sb,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
             |  FROM q),
             |t AS (SELECT na, nb,
             |    CAST((CAST(CAST(vq AS DECIMAL(38,0)) * cuma - sa AS DOUBLE) * CAST(cb AS DOUBLE)
             |        + CAST(CAST(vq AS DECIMAL(38,0)) * cumb - sb AS DOUBLE) * CAST(ca AS DOUBLE)) / 1e12 AS DECIMAL(38,12)) AS tab,
             |    CAST(2.0 * CAST(CAST(vq AS DECIMAL(38,0)) * cuma - sa AS DOUBLE) * CAST(ca AS DOUBLE) / 1e12 AS DECIMAL(38,12)) AS taa,
             |    CAST(2.0 * CAST(CAST(vq AS DECIMAL(38,0)) * cumb - sb AS DOUBLE) * CAST(cb AS DOUBLE) / 1e12 AS DECIMAL(38,12)) AS tbb
             |  FROM w),
             |agg AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |    CAST(SUM(tab) AS DOUBLE) AS sab,
             |    CAST(SUM(taa) AS DOUBLE) AS saa,
             |    CAST(SUM(tbb) AS DOUBLE) AS sbb
             |  FROM t GROUP BY na, nb),
             |f AS (SELECT n_a, n_b,
             |    CASE WHEN n_a > 0 AND n_b > 0
             |      THEN sab / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS m_ab,
             |    CASE WHEN n_a > 0
             |      THEN saa / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)) END AS m_aa,
             |    CASE WHEN n_b > 0
             |      THEN sbb / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS m_bb
             |  FROM agg)
             |SELECT n_a, n_b, m_ab, m_aa, m_bb,
             |  2.0 * m_ab - m_aa - m_bb AS energy FROM f""".stripMargin)),

    // Sliced energy distance: the drift injected ONLY into segment 1
    // (q353's convention - seg 1's energy must stand clear of seg 0's
    // near-zero; a pooled statistic dilutes it 2x).
    Q("q365_energy_by",
      (s, dir) => graft.operators.Analytics.energyDistanceBy(
        Tables.events(s, dir).select(
          pmod(col("user_id"), lit(2L)).as("seg"), col("event_type"),
          (col("value") * when(col("user_id") % 2 === 1 &&
            col("event_type") === "click" && col("event_id") % 3 === 0,
            2.0).otherwise(1.0)).as("v")),
        Seq("seg"), "event_type", "v", "view", "click")
        .orderBy("seg"),
      Some("""WITH vals AS (SELECT user_id % 2 AS seg, event_type AS g,
             |    CAST(value * CASE WHEN user_id % 2 = 1 AND event_type = 'click'
             |      AND event_id % 3 = 0 THEN 2.0 ELSE 1.0 END AS DOUBLE) AS v
             |  FROM events
             |  WHERE event_type IN ('view','click') AND value IS NOT NULL),
             |c AS (SELECT seg, v,
             |    CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1, 2),
             |q AS (SELECT seg, v, ca, cb,
             |    CAST(CAST(v AS DECIMAL(28,12)) * 1000000000000 AS BIGINT) AS vq
             |  FROM c),
             |w AS (SELECT seg, v, ca, cb, vq,
             |    COALESCE(SUM(ca) OVER (PARTITION BY seg ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cuma,
             |    COALESCE(SUM(cb) OVER (PARTITION BY seg ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
             |    COALESCE(SUM(CAST(vq AS DECIMAL(38,0)) * ca) OVER (PARTITION BY seg ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sa,
             |    COALESCE(SUM(CAST(vq AS DECIMAL(38,0)) * cb) OVER (PARTITION BY seg ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sb,
             |    SUM(ca) OVER (PARTITION BY seg) AS na,
             |    SUM(cb) OVER (PARTITION BY seg) AS nb
             |  FROM q),
             |t AS (SELECT seg, na, nb,
             |    CAST((CAST(CAST(vq AS DECIMAL(38,0)) * cuma - sa AS DOUBLE) * CAST(cb AS DOUBLE)
             |        + CAST(CAST(vq AS DECIMAL(38,0)) * cumb - sb AS DOUBLE) * CAST(ca AS DOUBLE)) / 1e12 AS DECIMAL(38,12)) AS tab,
             |    CAST(2.0 * CAST(CAST(vq AS DECIMAL(38,0)) * cuma - sa AS DOUBLE) * CAST(ca AS DOUBLE) / 1e12 AS DECIMAL(38,12)) AS taa,
             |    CAST(2.0 * CAST(CAST(vq AS DECIMAL(38,0)) * cumb - sb AS DOUBLE) * CAST(cb AS DOUBLE) / 1e12 AS DECIMAL(38,12)) AS tbb
             |  FROM w),
             |agg AS (SELECT seg, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |    CAST(SUM(tab) AS DOUBLE) AS sab,
             |    CAST(SUM(taa) AS DOUBLE) AS saa,
             |    CAST(SUM(tbb) AS DOUBLE) AS sbb
             |  FROM t GROUP BY seg, na, nb),
             |f AS (SELECT seg, n_a, n_b,
             |    CASE WHEN n_a > 0 AND n_b > 0
             |      THEN sab / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS m_ab,
             |    CASE WHEN n_a > 0
             |      THEN saa / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)) END AS m_aa,
             |    CASE WHEN n_b > 0
             |      THEN sbb / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS m_bb
             |  FROM agg)
             |SELECT seg, n_a, n_b, m_ab, m_aa, m_bb,
             |  CASE WHEN n_a > 0 AND n_b > 0
             |    THEN 2.0 * m_ab - m_aa - m_bb END AS energy
             |FROM f ORDER BY seg""".stripMargin))
  )
}
