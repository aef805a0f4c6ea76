package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 38 (round 12): Kendall τ-b concordance and the
  * Markov transition matrix.
  */
private[graft] object Batch38 {

  val queries: Seq[Q] = Seq(

    // Kendall τ-b on q223's fixture (price band × line count, ties
    // forced on both axes): pair counts, the concordant/discordant
    // decimal self-join, both tie corrections, and the pinned τ chain
    // all replayed — ρ (q223) and τ (this) now cover both rank-
    // correlation families on the same data.
    Q("q244_kendall_tau",
      (s, dir) => {
        val nl = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"))
        val o = Tables.orders(s, dir).join(nl, Seq("o_orderkey"))
          .withColumn("tp", floor(col("o_totalprice") / 1000).cast("long"))
        graft.operators.Analytics.kendallTau(o, "tp", "n_lines")
      },
      Some("""WITH j AS (SELECT o.o_orderkey,
             |    CAST(FLOOR(o.o_totalprice / 1000) AS BIGINT) AS x,
             |    n.n_lines AS y
             |  FROM orders o JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
             |    FROM lineitem GROUP BY 1) n ON n.l_orderkey = o.o_orderkey),
             |p AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
             |cd AS (SELECT
             |    SUM(CASE WHEN b.y > a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS DECIMAL(38,0)) END) AS nc,
             |    SUM(CASE WHEN b.y < a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS DECIMAL(38,0)) END) AS nd
             |  FROM p a JOIN p b ON b.x > a.x),
             |tx AS (SELECT SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t1 FROM (SELECT CAST(SUM(c) AS BIGINT) AS s FROM p GROUP BY x)),
             |ty AS (SELECT SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t2 FROM (SELECT CAST(SUM(c) AS BIGINT) AS s FROM p GROUP BY y)),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM p),
             |f AS (SELECT n.n, cd.nc, cd.nd,
             |    CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1) / 2.0 AS n0,
             |    CAST(tx.t1 AS DOUBLE) / 2.0 AS h1,
             |    CAST(ty.t2 AS DOUBLE) / 2.0 AS h2
             |  FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN n)
             |SELECT n, CAST(nc AS DOUBLE) AS nc, CAST(nd AS DOUBLE) AS nd,
             |  CASE WHEN n0 - h1 > 0 AND n0 - h2 > 0 THEN
             |    (CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE)) / sqrt((n0 - h1) * (n0 - h2)) END AS tau_b
             |FROM f""".stripMargin)),

    // Per-user first-order Markov transitions between event types:
    // lag window (ts, event_id tiebreak), transition counts, and every
    // conditional probability replayed.
    Q("q245_markov_transitions",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("ts_us", expr("ts div 1000"))
        graft.operators.Sessions.markovTransitions(ev, Seq("user_id"),
            "ts_us", "event_type", "event_id")
          .orderBy("prev", "next")
      },
      Some("""WITH s AS (SELECT user_id, event_type,
             |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events),
             |t AS (SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS n FROM t GROUP BY prev)
             |SELECT t.prev, t.next, t.c, CAST(t.c AS DOUBLE) / CAST(tot.n AS DOUBLE) AS p
             |FROM t JOIN tot ON t.prev = tot.prev ORDER BY t.prev, t.next""".stripMargin))
  )
}
