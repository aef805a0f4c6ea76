package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 47 (round 15, session 3): the k-group rank
  * test (Kruskal–Wallis, global + sliced), the multiplicity correction
  * the whole By-test family creates the need for (Benjamini–Hochberg
  * FDR), and chance-corrected inter-annotator agreement (Cohen's
  * kappa, global + sliced).
  */
private[graft] object Batch47 {

  val queries: Seq[Q] = Seq(

    // Kruskal–Wallis H across the five order priorities — the k-group
    // RANK screen beside q296's mean screen (same fixture family):
    // doubled mid-ranks on the distinct-value prefix, per-group decimal
    // rank sums, tie correction Σ(t³−t), ordered cross-group fold, and
    // the pinned H chain all replayed.
    Q("q313_kruskal_wallis",
      (s, dir) => graft.operators.Analytics.kruskalWallis(
        Tables.orders(s, dir), "o_orderpriority", "o_totalprice"),
      Some("""WITH base AS (SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
             |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
             |vt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY 1),
             |cum AS (SELECT v, t,
             |    COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM vt),
             |ties AS (SELECT SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties FROM vt),
             |pc AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
             |r AS (SELECT pc.g, CAST(SUM(pc.c) AS BIGINT) AS ng,
             |    SUM(CAST(pc.c AS DECIMAL(38,0)) * (2 * cum.bef + cum.t + 1)) AS r2g
             |  FROM pc JOIN cum ON pc.v = cum.v GROUP BY 1),
             |gt AS (SELECT g, ng,
             |    CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE) / CAST(ng AS DOUBLE) AS bt
             |  FROM r),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(bt ORDER BY g)), (x, y) -> x + y) AS s
             |  FROM gt)
             |SELECT k, n,
             |  CASE WHEN k > 1 AND n > 1 AND
             |      (1.0 - CAST(ties.ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) > 0
             |    THEN (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * (s / 4.0) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             |      / (1.0 - CAST(ties.ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
             |  END AS h
             |FROM a, ties""".stripMargin)),

    // Sliced Kruskal–Wallis: per language, did ANY source's length
    // profile shift — the k-sample screen that says WHICH slice needs
    // the pairwise follow-up. Keyed distributed prefix for the ranks;
    // heavy ties in n_chars exercise the correction.
    Q("q314_kruskal_wallis_by",
      (s, dir) => graft.operators.Analytics.kruskalWallisBy(
          Tables.documents(s, dir), Seq("lang"), "source", "n_chars")
        .orderBy("lang"),
      Some("""WITH base AS (SELECT lang, source AS g, n_chars AS v FROM documents
             |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
             |vt AS (SELECT lang, v, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY 1, 2),
             |cum AS (SELECT lang, v, t,
             |    COALESCE(SUM(t) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM vt),
             |ties AS (SELECT lang, SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties
             |  FROM vt GROUP BY 1),
             |pc AS (SELECT lang, g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2, 3),
             |r AS (SELECT pc.lang, pc.g, CAST(SUM(pc.c) AS BIGINT) AS ng,
             |    SUM(CAST(pc.c AS DECIMAL(38,0)) * (2 * cum.bef + cum.t + 1)) AS r2g
             |  FROM pc JOIN cum ON pc.lang = cum.lang AND pc.v = cum.v GROUP BY 1, 2),
             |gt AS (SELECT lang, g, ng,
             |    CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE) / CAST(ng AS DOUBLE) AS bt
             |  FROM r),
             |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(bt ORDER BY g)), (x, y) -> x + y) AS s
             |  FROM gt GROUP BY 1)
             |SELECT a.lang, k, n,
             |  CASE WHEN k > 1 AND n > 1 AND
             |      (1.0 - CAST(ties.ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) > 0
             |    THEN (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * (s / 4.0) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             |      / (1.0 - CAST(ties.ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
             |  END AS h
             |FROM a JOIN ties ON a.lang = ties.lang
             |ORDER BY a.lang""".stripMargin)),

    // Benjamini–Hochberg FDR adjustment over a per-user hypothesis
    // table: deterministic salted p-values (so the oracle replays every
    // draw), ~9% NULLs (excluded from n, p_adj NULL), and user count >
    // modulus forces tied p-values (shared largest rank). The distinct-p
    // rank, the p·n/rank chain, the suffix-inclusive cummin, and the
    // cap at 1 are all replayed by DuckDB windows.
    Q("q315_bh_adjust",
      (s, dir) => {
        val hyp = Tables.events(s, dir)
          .select(col("user_id")).distinct()
          .withColumn("p",
            when(col("user_id") % 97 =!= 0,
              ((col("user_id") * 2654435761L) % 1009L).cast("double")
                / 1009.0))
        graft.operators.Analytics.bhAdjust(hyp, "p")
          .orderBy("user_id")
      },
      Some("""WITH hyp AS (SELECT DISTINCT user_id FROM events),
             |x AS (SELECT user_id,
             |    CASE WHEN user_id % 97 <> 0
             |      THEN CAST((user_id * 2654435761) % 1009 AS DOUBLE) / 1009.0 END AS p
             |  FROM hyp),
             |n AS (SELECT CAST(COUNT(p) AS BIGINT) AS n FROM x),
             |dp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM x WHERE p IS NOT NULL GROUP BY 1),
             |r AS (SELECT p, c, SUM(c) OVER (ORDER BY p ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r FROM dp),
             |q AS (SELECT p, CAST(p AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(r AS DOUBLE) AS q FROM r, n),
             |m AS (SELECT p, LEAST(1.0, MIN(q) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS mn FROM q)
             |SELECT x.user_id, x.p, m.mn AS p_adj
             |FROM x LEFT JOIN m ON x.p = m.p
             |ORDER BY x.user_id""".stripMargin)),

    // Cohen's kappa between the lineitem return flag and line status —
    // chance-corrected agreement of two categorical labelings (3×2
    // classes, asymmetric). Everything integer up to the final
    // division: κ = (n·Σ a_kk − Σ na_k·nb_k)/(n² − Σ na_k·nb_k).
    Q("q316_cohens_kappa",
      (s, dir) => graft.functions.ML.cohensKappa(
        Tables.lineitem(s, dir), "l_returnflag", "l_linestatus"),
      Some("""WITH cell AS (SELECT l_returnflag AS a, l_linestatus AS b,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
             |  GROUP BY 1, 2),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agr
             |  FROM cell),
             |ma AS (SELECT a AS k, CAST(SUM(c) AS BIGINT) AS na FROM cell GROUP BY 1),
             |mb AS (SELECT b AS k, CAST(SUM(c) AS BIGINT) AS nb FROM cell GROUP BY 1),
             |pe AS (SELECT COALESCE(SUM(CAST(na AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))), 0) AS pe2
             |  FROM ma JOIN mb ON ma.k = mb.k)
             |SELECT n,
             |  CASE WHEN n > 0 THEN CAST(agr AS DOUBLE) / CAST(n AS DOUBLE) END AS po,
             |  CASE WHEN n > 0 THEN CAST(pe2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) END AS pe,
             |  CASE WHEN CAST(n AS DECIMAL(38,0)) * n - pe2 > 0
             |    THEN CAST(CAST(n AS DECIMAL(38,0)) * agr - pe2 AS DOUBLE) /
             |      CAST(CAST(n AS DECIMAL(38,0)) * n - pe2 AS DOUBLE)
             |  END AS kappa
             |FROM tot, pe""".stripMargin)),

    // Sliced kappa: per event type, agreement between two deterministic
    // 4-class labelings of the same events — the per-slice audit that
    // catches a labeler pair diverging on ONE slice while agreeing in
    // aggregate.
    Q("q317_cohens_kappa_by",
      (s, dir) => graft.functions.ML.cohensKappaBy(
          Tables.events(s, dir)
            .withColumn("r1", col("user_id") % 4)
            .withColumn("r2", col("event_id") % 4),
          Seq("event_type"), "r1", "r2")
        .orderBy("event_type"),
      Some("""WITH base AS (SELECT event_type,
             |    CAST(user_id % 4 AS BIGINT) AS a, CAST(event_id % 4 AS BIGINT) AS b
             |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
             |cell AS (SELECT event_type, a, b, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM base GROUP BY 1, 2, 3),
             |tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agr
             |  FROM cell GROUP BY 1),
             |ma AS (SELECT event_type, a AS k, CAST(SUM(c) AS BIGINT) AS na FROM cell GROUP BY 1, 2),
             |mb AS (SELECT event_type, b AS k, CAST(SUM(c) AS BIGINT) AS nb FROM cell GROUP BY 1, 2),
             |pe AS (SELECT ma.event_type,
             |    SUM(CAST(na AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))) AS pe2
             |  FROM ma JOIN mb ON ma.event_type = mb.event_type AND ma.k = mb.k
             |  GROUP BY 1)
             |SELECT tot.event_type, n,
             |  CASE WHEN n > 0 THEN CAST(agr AS DOUBLE) / CAST(n AS DOUBLE) END AS po,
             |  CASE WHEN n > 0 THEN CAST(COALESCE(pe2, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) END AS pe,
             |  CASE WHEN CAST(n AS DECIMAL(38,0)) * n - COALESCE(pe2, 0) > 0
             |    THEN CAST(CAST(n AS DECIMAL(38,0)) * agr - COALESCE(pe2, 0) AS DOUBLE) /
             |      CAST(CAST(n AS DECIMAL(38,0)) * n - COALESCE(pe2, 0) AS DOUBLE)
             |  END AS kappa
             |FROM tot LEFT JOIN pe ON tot.event_type = pe.event_type
             |ORDER BY tot.event_type""".stripMargin)),
  )
}
