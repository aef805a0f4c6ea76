package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 93 (round 19, continuation wave R): restricted
  * mean survival time — the KM integral on the q326 time-to-first-
  * purchase fixture.
  */
private[graft] object Batch93 {

  val queries: Seq[Q] = Seq(

    // RMST at tau = 240 hours over the q326 subjects (hours from first
    // activity to first purchase, censored at last activity): the full
    // KM quantized-log chain, the exclusive/inclusive survival pair
    // per event time, and the Abel drop-sum (each t*dS term quantized
    // at scale 18) all replayed by DuckDB's cumulative windows.
    Q("q483_rmst",
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
        graft.operators.Analytics.rmst(subj, "dur", col("ev"),
          tau = 240.0)
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
             |c AS (SELECT CAST(dur AS DOUBLE) AS t,
             |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
             |    CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
             |  FROM subj GROUP BY 1),
             |n AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM c),
             |r AS (SELECT t, d, c,
             |    n.n - COALESCE(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS risk
             |  FROM c, n),
             |tm AS (SELECT t, d, c, risk,
             |    CASE WHEN d > 0 AND d < risk
             |      THEN CAST(CAST(ln(1.0 - CAST(d AS DOUBLE) / CAST(risk AS DOUBLE)) AS DECIMAL(28,12)) * 1000000000000 AS BIGINT)
             |      ELSE 0 END AS q,
             |    CASE WHEN d > 0 AND d = risk THEN 1 ELSE 0 END AS z
             |  FROM r),
             |cum AS (SELECT t, d, q, z,
             |    COALESCE(SUM(q) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sqp,
             |    COALESCE(SUM(z) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS szp,
             |    SUM(q) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS sq,
             |    SUM(z) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS sz
             |  FROM tm),
             |k AS (SELECT * FROM cum WHERE d > 0 AND t < 240.0),
             |a AS (SELECT
             |    COALESCE(CAST(SUM(CAST(t *
             |      ((CASE WHEN szp > 0 THEN 0.0 ELSE exp(CAST(sqp AS DOUBLE) / 1e12) END)
             |       - (CASE WHEN sz > 0 THEN 0.0 ELSE exp(CAST(sq AS DOUBLE) / 1e12) END))
             |      AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS dropsum,
             |    COALESCE(SUM(q), 0) AS qk,
             |    COALESCE(SUM(z), 0) AS zk,
             |    CAST(COALESCE(SUM(d), 0) AS BIGINT) AS events
             |  FROM k),
             |nn AS (SELECT CAST(COALESCE(SUM(d + c), 0) AS BIGINT) AS n FROM c)
             |SELECT CAST(240.0 AS DOUBLE) AS tau, nn.n, a.events,
             |  CASE WHEN nn.n > 0 THEN
             |    CASE WHEN a.zk > 0 THEN 0.0
             |      ELSE exp(CAST(a.qk AS DOUBLE) / 1e12) END END AS survival_tau,
             |  CASE WHEN nn.n > 0 THEN
             |    240.0 * (CASE WHEN a.zk > 0 THEN 0.0
             |      ELSE exp(CAST(a.qk AS DOUBLE) / 1e12) END) + a.dropsum
             |  END AS rmst
             |FROM a CROSS JOIN nn""".stripMargin))
  )
}
