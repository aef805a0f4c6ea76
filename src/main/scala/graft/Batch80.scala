package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 80 (round 18, wave 6): training-data curation
  * — token-budget selection, deterministic domain-mix downsampling,
  * and importance-weight diagnostics.
  */
private[graft] object Batch80 {

  val queries: Seq[Q] = Seq(

    // Token-budget curation over deterministic (score, tokens): the
    // (score DESC, id ASC) rank, the inclusive cumulative token count
    // (distributed prefix + per-score tie window), and the budget
    // verdict are replayed by DuckDB's ordered window.
    Q("q442_token_budget",
      (s, dir) => graft.functions.Sampling.tokenBudgetSample(
        Tables.documents(s, dir).select(
          col("doc_id"),
          (pmod(col("doc_id") * 2654435761L, lit(1000L)).cast("double") /
            lit(1000.0)).as("score"),
          (pmod(col("doc_id") * 7919L, lit(400L)) + 50L).as("tokens")),
        "doc_id", "score", "tokens", budget = 30000L)
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
             |    CAST((doc_id * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS score,
             |    CAST((doc_id * 7919) % 400 + 50 AS BIGINT) AS tokens
             |  FROM documents),
             |c AS (SELECT doc_id, score, tokens,
             |    CAST(SUM(tokens) OVER (ORDER BY score DESC, doc_id ASC
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |  FROM b)
             |SELECT doc_id, score, tokens, cum_tokens,
             |  cum_tokens <= 30000 AS kept
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Domain-mix downsampling to a 25/25/50 event-type mix: the
    // binding domain's full retention, the derived per-domain
    // keep-rates, the integer hash thresholds, and the kept id set
    // are all replayed by DuckDB from the same counts.
    Q("q443_mix_to_shares",
      (s, dir) => graft.functions.Sampling.mixToShares(
        Tables.events(s, dir), "event_type", "event_id",
        Seq("view" -> 0.25, "click" -> 0.25, "purchase" -> 0.5),
        salt = "mx")
        .select(col("event_id"), col("event_type"), col("keep_rate"))
        .orderBy("event_id"),
      Some("""WITH n AS (SELECT
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS nv,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
             |  FROM events),
             |sm AS (SELECT nv, nc, np,
             |    LEAST(CAST(nv AS DOUBLE) / 0.25, CAST(nc AS DOUBLE) / 0.25,
             |      CAST(np AS DOUBLE) / 0.5) AS s FROM n),
             |r AS (SELECT
             |    s * 0.25 / CAST(nv AS DOUBLE) AS rv,
             |    s * 0.25 / CAST(nc AS DOUBLE) AS rc,
             |    s * 0.5 / CAST(np AS DOUBLE) AS rp FROM sm),
             |t AS (SELECT
             |    CAST(FLOOR(rv * 4294967296.0) AS BIGINT) AS tv,
             |    CAST(FLOOR(rc * 4294967296.0) AS BIGINT) AS tc,
             |    CAST(FLOOR(rp * 4294967296.0) AS BIGINT) AS tp,
             |    rv, rc, rp FROM r)
             |SELECT e.event_id, e.event_type,
             |  CASE e.event_type WHEN 'view' THEN t.rv
             |    WHEN 'click' THEN t.rc ELSE t.rp END AS keep_rate
             |FROM events e CROSS JOIN t
             |WHERE e.event_type IN ('view', 'click', 'purchase')
             |  AND CAST('0x' || substr(md5('mx' || CAST(e.event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |    < CASE e.event_type WHEN 'view' THEN t.tv
             |        WHEN 'click' THEN t.tc ELSE t.tp END
             |ORDER BY e.event_id""".stripMargin)),

    // Kish effective sample size + dominance diagnostics over a
    // deterministic weight column: exact decimal first and second
    // moments, the (sum w)^2 / sum w^2 identity, and the max-share
    // ratio replayed by DuckDB.
    Q("q444_weight_diagnostics",
      (s, dir) => graft.functions.Sampling.weightDiagnostics(
        Tables.events(s, dir).select(
          ((pmod(col("event_id"), lit(17L)) + 1L).cast("double") /
            lit(4.0)).as("w")),
        "w"),
      Some("""WITH b AS (SELECT
             |    CAST(CAST(event_id % 17 + 1 AS DOUBLE) / 4.0 AS DECIMAL(18,6)) AS w
             |  FROM events),
             |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(w) AS DOUBLE) AS sw,
             |    CAST(SUM(w * w) AS DOUBLE) AS sww,
             |    CAST(MAX(w) AS DOUBLE) AS wmax
             |  FROM b)
             |SELECT n, sw AS sum_w,
             |  CASE WHEN sww > 0 THEN sw * sw / sww END AS ess,
             |  CASE WHEN n > 0 THEN
             |    CASE WHEN sww > 0 THEN sw * sw / sww END / CAST(n AS DOUBLE)
             |  END AS ess_ratio,
             |  CASE WHEN sw > 0 THEN wmax / sw END AS max_share
             |FROM s""".stripMargin))
  )
}
