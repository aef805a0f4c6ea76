package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 74 (round 17, wave 7): Bowker's symmetry test
  * (multi-class McNemar), the pairwise-κ rater matrix, and NDCG@k
  * ranking evaluation.
  */
private[graft] object Batch74 {

  val queries: Seq[Q] = Seq(

    // Bowker symmetry on a paired re-labeling of event types (every
    // 7th event's label rotates): off-diagonal pair chi2, dof = pairs
    // with any discordance.
    Q("q425_bowker",
      (s, dir) => {
        val rot = when(col("event_type") === "view", "click")
          .when(col("event_type") === "click", "purchase")
          .when(col("event_type") === "purchase", "view")
          .otherwise(col("event_type"))
        graft.operators.Analytics.bowkerTest(
          Tables.events(s, dir)
            .withColumn("pass2",
              when(pmod(col("event_id"), lit(7L)) === 0, rot)
                .otherwise(col("event_type"))),
          "event_type", "pass2")
      },
      Some("""WITH b AS (SELECT event_type AS a,
             |    CASE WHEN event_id % 7 = 0 THEN
             |      CASE event_type WHEN 'view' THEN 'click'
             |        WHEN 'click' THEN 'purchase'
             |        WHEN 'purchase' THEN 'view' ELSE event_type END
             |      ELSE event_type END AS bb
             |  FROM events WHERE event_type IS NOT NULL),
             |cells AS (SELECT a, bb, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM b GROUP BY 1, 2),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
             |k AS (SELECT CAST(COUNT(DISTINCT l) AS BIGINT) AS k_levels
             |  FROM (SELECT a AS l FROM cells UNION SELECT bb FROM cells)),
             |sym AS (SELECT LEAST(a, bb) AS lo, GREATEST(a, bb) AS hi,
             |    CAST(SUM(CASE WHEN a < bb THEN c ELSE 0 END) AS BIGINT) AS nij,
             |    CAST(SUM(CASE WHEN a > bb THEN c ELSE 0 END) AS BIGINT) AS nji
             |  FROM cells WHERE a <> bb GROUP BY 1, 2),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS pairs_used,
             |    CAST(SUM(CAST((CAST(nij AS DOUBLE) - CAST(nji AS DOUBLE)) *
             |      (CAST(nij AS DOUBLE) - CAST(nji AS DOUBLE)) /
             |      (CAST(nij AS DOUBLE) + CAST(nji AS DOUBLE))
             |      AS DECIMAL(28,12))) AS DOUBLE) AS chi2raw
             |  FROM sym)
             |SELECT tot.n, k.k_levels,
             |  COALESCE(agg.pairs_used, 0) AS pairs_used,
             |  CASE WHEN agg.pairs_used > 0 THEN agg.chi2raw END AS chi2,
             |  CASE WHEN agg.pairs_used > 0 THEN agg.pairs_used END AS dof
             |FROM tot, k, agg""".stripMargin)),

    // Pairwise-kappa matrix over the 3-rater document panel (the
    // README agreement fixture): one item self-join, the exact
    // integer kappa identity per rater pair.
    Q("q426_pairwise_kappa",
      (s, dir) => {
        val panel = (0 to 2).map(r => Tables.documents(s, dir)
          .select(col("doc_id"), lit(r).as("rater"),
            when(col("doc_id") % (5 + r) === 0,
              ((col("doc_id") + 1) % 3).cast("string"))
              .otherwise((col("doc_id") % 3).cast("string")).as("label")))
          .reduce(_ union _)
        graft.functions.ML.pairwiseKappa(panel, "doc_id", "rater", "label")
      },
      Some("""WITH panel AS (
             |  SELECT doc_id, r AS rater,
             |    CASE WHEN doc_id % (5 + r) = 0
             |      THEN CAST((doc_id + 1) % 3 AS VARCHAR)
             |      ELSE CAST(doc_id % 3 AS VARCHAR) END AS label
             |  FROM documents, (SELECT unnest([0, 1, 2]) AS r)),
             |pairs AS (SELECT a.rater AS ra, b.rater AS rb,
             |    a.label AS la, b.label AS lb
             |  FROM panel a JOIN panel b
             |    ON a.doc_id = b.doc_id AND a.rater < b.rater),
             |cell AS (SELECT ra, rb, la, lb, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM pairs GROUP BY 1, 2, 3, 4),
             |tot AS (SELECT ra, rb, CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT) AS agr
             |  FROM cell GROUP BY 1, 2),
             |ma AS (SELECT ra, rb, la AS k, CAST(SUM(c) AS BIGINT) AS na
             |  FROM cell GROUP BY 1, 2, 3),
             |mb AS (SELECT ra, rb, lb AS k, CAST(SUM(c) AS BIGINT) AS nb
             |  FROM cell GROUP BY 1, 2, 3),
             |pe AS (SELECT ma.ra, ma.rb,
             |    COALESCE(SUM(CAST(na AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))), 0) AS pe2
             |  FROM ma JOIN mb ON ma.ra = mb.ra AND ma.rb = mb.rb AND ma.k = mb.k
             |  GROUP BY 1, 2)
             |SELECT CAST(tot.ra AS INT) AS rater_a, CAST(tot.rb AS INT) AS rater_b, tot.n,
             |  CASE WHEN tot.n > 0 THEN CAST(agr AS DOUBLE) / CAST(tot.n AS DOUBLE) END AS po,
             |  CASE WHEN tot.n > 0 THEN CAST(pe.pe2 AS DOUBLE) /
             |    (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)) END AS pe,
             |  CASE WHEN CAST(tot.n AS DECIMAL(38,0)) * tot.n - pe.pe2 > 0
             |    THEN CAST(CAST(tot.n AS DECIMAL(38,0)) * agr - pe.pe2 AS DOUBLE) /
             |      CAST(CAST(tot.n AS DECIMAL(38,0)) * tot.n - pe.pe2 AS DOUBLE) END AS kappa
             |FROM tot LEFT JOIN pe ON tot.ra = pe.ra AND tot.rb = pe.rb
             |ORDER BY rater_a, rater_b""".stripMargin)),

    // NDCG@10 over 20 synthetic judged queries (deterministic scores
    // and graded relevance from the doc id): score-ranked DCG vs the
    // ideal ordering, id tie-breaks, pinned gain terms. Round 18:
    // points at the ONE consolidated Retrieval.ndcgAtK (the former
    // ML.ndcgAtK near-duplicate was folded in; includeNDocs=true keeps
    // this entry's wider n_docs schema — q289 exercises the default
    // schema). Gain terms use the LN/LN log₂ pin, same as q289.
    Q("q427_ndcg",
      (s, dir) => graft.functions.Retrieval.ndcgAtK(
        Tables.documents(s, dir).select(
          pmod(col("doc_id"), lit(20L)).as("q"),
          col("doc_id").as("doc"),
          pmod(col("doc_id") * 2654435761L, lit(1000L)).cast("double")
            .as("score"),
          pmod(col("doc_id"), lit(4L)).as("rel")),
        "q", "doc", "score", "rel", k = 10, includeNDocs = true)
        .orderBy("q"),
      Some("""WITH b AS (SELECT doc_id % 20 AS q, doc_id AS doc,
             |    CAST((doc_id * 2654435761) % 1000 AS DOUBLE) AS score,
             |    doc_id % 4 AS rel
             |  FROM documents),
             |r AS (SELECT q, doc, rel,
             |    ROW_NUMBER() OVER (PARTITION BY q ORDER BY score DESC, doc ASC) AS pos,
             |    ROW_NUMBER() OVER (PARTITION BY q ORDER BY rel DESC, doc ASC) AS ipos
             |  FROM b),
             |agg AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(CASE WHEN pos <= 10 THEN
             |      CAST((POW(2.0, CAST(rel AS DOUBLE)) - 1.0) /
             |        (LN(CAST(pos AS DOUBLE) + 1.0) / LN(2.0)) AS DECIMAL(28,12)) END) AS DOUBLE) AS dcg,
             |    CAST(SUM(CASE WHEN ipos <= 10 THEN
             |      CAST((POW(2.0, CAST(rel AS DOUBLE)) - 1.0) /
             |        (LN(CAST(ipos AS DOUBLE) + 1.0) / LN(2.0)) AS DECIMAL(28,12)) END) AS DOUBLE) AS idcg
             |  FROM r GROUP BY q)
             |SELECT q, n_docs, dcg, idcg,
             |  CASE WHEN idcg > 0 THEN dcg / idcg END AS ndcg
             |FROM agg ORDER BY q""".stripMargin))
  )
}
