package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 51 (round 15, session 3): survival analysis
  * (Kaplan–Meier with right censoring), the equal-frequency binning
  * transform, and weight-of-evidence feature screening.
  */
private[graft] object Batch51 {

  val queries: Seq[Q] = Seq(

    // Time-to-first-purchase survival (hours since each user's first
    // activity; non-purchasers censored at their last activity): the
    // product-limit estimator in log space — at-risk prefix, decimal
    // ln-term accumulation, exp — all replayed by DuckDB windows.
    Q("q326_kaplan_meier",
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
        graft.operators.Analytics.kaplanMeier(subj, "dur", col("ev"))
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
             |    CASE WHEN d > 0 AND d < risk
             |      THEN CAST(CAST(ln(1.0 - CAST(d AS DOUBLE) / CAST(risk AS DOUBLE)) AS DECIMAL(28,12)) * 1000000000000 AS BIGINT)
             |      ELSE 0 END AS q,
             |    CASE WHEN d > 0 AND d = risk THEN 1 ELSE 0 END AS z
             |  FROM r),
             |cum AS (SELECT t, risk, d, c,
             |    SUM(q) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sq,
             |    SUM(z) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sz
             |  FROM tm)
             |SELECT t, CAST(risk AS BIGINT) AS n_risk, d, c,
             |  CASE WHEN sz > 0 THEN 0.0 ELSE exp(CAST(sq AS DOUBLE) / 1e12) END AS survival
             |FROM cum WHERE d > 0 ORDER BY t""".stripMargin)),

    // Equal-frequency decile binning of prices, checked end-to-end by
    // aggregating the TRANSFORM's per-row output (counts + exact value
    // fences per bin). Tied values always share a bin — the oracle
    // replays bin(v) = (rank_before * 10) div n over distinct values.
    Q("q327_quantile_bin",
      (s, dir) => graft.operators.Aggregations.quantileBin(
          Tables.lineitem(s, dir).select("l_extendedprice"),
          "l_extendedprice", bins = 10)
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min("l_extendedprice").as("lo"),
          max("l_extendedprice").as("hi"))
        .orderBy("bin"),
      Some("""WITH c AS (SELECT l_extendedprice AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |cum AS (SELECT v, c,
             |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |    SUM(c) OVER () AS n
             |  FROM c),
             |b AS (SELECT v, c, (s * 10) // n AS bin FROM cum)
             |SELECT CAST(bin AS BIGINT) AS bin, CAST(SUM(c) AS BIGINT) AS n,
             |  MIN(v) AS lo, MAX(v) AS hi
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Weight-of-evidence / information-value screening: does order
    // priority separate fulfilled from open orders. Exact counts,
    // pinned share/ln chains; levels with a zero cell emit NULL woe.
    Q("q328_woe_iv",
      (s, dir) => graft.functions.ML.woeTable(
          Tables.orders(s, dir), "o_orderpriority",
          col("o_orderstatus") === "F")
        .orderBy("level"),
      Some("""WITH g AS (SELECT o_orderpriority AS level, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS g,
             |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS b
             |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
             |tot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt, CAST(SUM(b) AS BIGINT) AS bt FROM g),
             |s AS (SELECT level, n, g, b,
             |    CASE WHEN gt > 0 THEN CAST(g AS DOUBLE) / CAST(gt AS DOUBLE) END AS share_g,
             |    CASE WHEN bt > 0 THEN CAST(b AS DOUBLE) / CAST(bt AS DOUBLE) END AS share_b,
             |    CASE WHEN g > 0 AND b > 0 AND gt > 0 AND bt > 0
             |      THEN ln((CAST(g AS DOUBLE) / CAST(gt AS DOUBLE)) / (CAST(b AS DOUBLE) / CAST(bt AS DOUBLE))) END AS woe
             |  FROM g, tot)
             |SELECT level, n, g, b, share_g, share_b, woe,
             |  (share_g - share_b) * woe AS iv_term
             |FROM s ORDER BY level""".stripMargin)),
  )
}
