package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 59 (round 16, session 2): the agreement /
  * post-hoc family — Dunn's pairwise follow-up to q313's
  * Kruskal–Wallis, Kendall's W m-judge concordance, and Fleiss' kappa
  * multi-rater agreement beside q316's two-rater Cohen form.
  */
private[graft] object Batch59 {

  val queries: Seq[Q] = Seq(

    // Dunn post-hoc on q313's exact fixture (order priorities x total
    // price): WHICH priorities differ once q313 says some do - pooled
    // mid-ranks, tie-corrected variance, all C(5,2) pairs replayed.
    Q("q375_dunn_test",
      (s, dir) => graft.operators.Analytics.dunnTest(
        Tables.orders(s, dir), "o_orderpriority", "o_totalprice")
        .orderBy("g_a", "g_b"),
      Some("""WITH base AS (SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
             |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
             |vt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY 1),
             |cum AS (SELECT v, t,
             |    COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM vt),
             |tn AS (SELECT SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties,
             |    CAST(SUM(t) AS BIGINT) AS n FROM vt),
             |pc AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
             |r AS (SELECT pc.g, CAST(SUM(pc.c) AS BIGINT) AS ng,
             |    SUM(CAST(pc.c AS DECIMAL(38,0)) * (2 * cum.bef + cum.t + 1)) AS r2g
             |  FROM pc JOIN cum ON pc.v = cum.v GROUP BY 1),
             |p AS (SELECT a.g AS g_a, b.g AS g_b, a.ng AS n_a, b.ng AS n_b,
             |    CAST(a.r2g AS DOUBLE) / (CAST(a.ng AS DOUBLE) * 2.0) AS mean_rank_a,
             |    CAST(b.r2g AS DOUBLE) / (CAST(b.ng AS DOUBLE) * 2.0) AS mean_rank_b
             |  FROM r a JOIN r b ON a.g < b.g),
             |vv AS (SELECT CASE WHEN CAST(n AS DOUBLE) > 1
             |    THEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 12.0
             |      - CAST(ties AS DOUBLE) / ((CAST(n AS DOUBLE) - 1.0) * 12.0) END AS var
             |  FROM tn)
             |SELECT g_a, g_b, n_a, n_b, mean_rank_a, mean_rank_b,
             |  CASE WHEN var > 0 THEN (mean_rank_a - mean_rank_b)
             |    / SQRT(var * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) END AS z
             |FROM p, vv ORDER BY g_a, g_b""".stripMargin)),

    // Kendall's W: do the five event types agree on a ranking of the
    // 25 user buckets by value mass - per-judge mid-ranks on the keyed
    // prefix, exact doubled-rank sums, the tie-corrected W chain.
    Q("q376_kendall_w",
      (s, dir) => {
        val cell = Tables.events(s, dir)
          .groupBy(col("event_type").as("j"),
            pmod(col("user_id"), lit(25L)).as("i"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("v"))
        graft.operators.Analytics.kendallW(cell, "j", "i", "v")
      },
      Some("""WITH cell AS (SELECT event_type AS j, user_id % 25 AS i,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT CAST(COUNT(DISTINCT j) AS BIGINT) AS m FROM cell),
             |per AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS mj FROM cell GROUP BY 1),
             |kept AS (SELECT cell.* FROM cell JOIN per ON cell.i = per.i, m
             |  WHERE per.mj = m.m),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded
             |  FROM per, m WHERE per.mj <> m.m),
             |vt AS (SELECT j, v, CAST(COUNT(*) AS BIGINT) AS t FROM kept GROUP BY 1, 2),
             |cum AS (SELECT j, v, t,
             |    COALESCE(SUM(t) OVER (PARTITION BY j ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM vt),
             |ranked AS (SELECT k.i, 2 * cum.bef + cum.t + 1 AS r2
             |  FROM kept k JOIN cum ON k.j = cum.j AND k.v = cum.v),
             |ties AS (SELECT COALESCE(SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))), 0) AS tj FROM vt),
             |items AS (SELECT i, SUM(r2) AS r2i FROM ranked GROUP BY 1),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    COALESCE(SUM(CAST(r2i AS DECIMAL(38,0)) * CAST(r2i AS DECIMAL(38,0))), 0) AS sr2
             |  FROM items),
             |f AS (SELECT m.m, agg.n, exc.n_excluded,
             |    12.0 * CAST(sr2 AS DOUBLE) / 4.0
             |      - 3.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE) * CAST(n AS DOUBLE)
             |        * (CAST(n AS DOUBLE) + 1.0) * (CAST(n AS DOUBLE) + 1.0) AS num,
             |    CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE) * CAST(n AS DOUBLE)
             |      * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)
             |      - CAST(m.m AS DOUBLE) * CAST(ties.tj AS DOUBLE) AS den
             |  FROM m, agg, exc, ties)
             |SELECT m, n, n_excluded,
             |  CASE WHEN den > 0 THEN num / den END AS w,
             |  CASE WHEN den > 0 THEN CAST(m AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (num / den) END AS chi2
             |FROM f""".stripMargin)),

    // Fleiss' kappa: each block of five consecutive events as one
    // "subject" rated five times by event type - dense event_ids make
    // every subject exactly arity 5; exact cell squares, pinned
    // share chain.
    Q("q377_fleiss_kappa",
      (s, dir) => graft.functions.ML.fleissKappa(
        Tables.events(s, dir)
          .withColumn("subj", expr("event_id div 5")),
        "subj", "event_type", raters = 5),
      Some("""WITH cells AS (SELECT event_id // 5 AS s, event_type AS k,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |subj AS (SELECT s, CAST(SUM(c) AS BIGINT) AS m,
             |    SUM(CAST(c AS DECIMAL(38,0)) * c) AS s2 FROM cells GROUP BY 1),
             |kept AS (SELECT * FROM subj WHERE m = 5),
             |exc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded FROM subj WHERE m <> 5),
             |pbar AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             |    COALESCE(SUM(s2), 0) AS ss FROM kept),
             |cat AS (SELECT cells.k, CAST(SUM(cells.c) AS BIGINT) AS ck
             |  FROM cells JOIN kept ON cells.s = kept.s GROUP BY 1),
             |pe AS (SELECT CAST(COALESCE(SUM(CAST(
             |      (CAST(ck AS DOUBLE) / (CAST(p.n_subjects AS DOUBLE) * 5.0))
             |      * (CAST(ck AS DOUBLE) / (CAST(p.n_subjects AS DOUBLE) * 5.0))
             |    AS DECIMAL(28,12))), 0) AS DOUBLE) AS p_e
             |  FROM cat, pbar p),
             |f AS (SELECT p.n_subjects, exc.n_excluded, 5 AS m,
             |    CASE WHEN p.n_subjects > 0
             |      THEN (CAST(ss AS DOUBLE) - CAST(p.n_subjects AS DOUBLE) * 5.0)
             |        / (CAST(p.n_subjects AS DOUBLE) * 5.0 * 4.0) END AS p_bar,
             |    pe.p_e
             |  FROM pbar p, exc, pe)
             |SELECT n_subjects, n_excluded, m, p_bar, p_e,
             |  CASE WHEN n_subjects > 0 AND 1.0 - p_e > 0
             |    THEN (p_bar - p_e) / (1.0 - p_e) END AS kappa
             |FROM f""".stripMargin))
  )
}
