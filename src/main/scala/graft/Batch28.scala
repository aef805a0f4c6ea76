package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 28 (round 11, sixth session, wave 19):
  * exact MIPS top-k and calibration bins.
  */
private[graft] object Batch28 {

  val queries: Seq[Q] = Seq(

    // Exact max-inner-product top-k (query ids < 5 against the rest):
    // the oracle re-derives every decimal(12,9)-exact dot product and
    // the (dot desc, id asc) ranking — q37's gate with the metric
    // swapped from cosine to the raw inner product.
    Q("q219_dot_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        graft.functions.Similarity.dotTopK(e,
            e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id AS id,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings),
             |dots AS (SELECT q.id AS query_id, c.id AS id,
             |    CAST(SUM(q.vd * c.vd) AS DOUBLE) AS dot
             |  FROM e q JOIN e c ON q.pos = c.pos AND q.id < 5 AND c.id <> q.id
             |  GROUP BY 1, 2),
             |ranked AS (SELECT query_id, id, dot, CAST(ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY dot DESC, id ASC) AS BIGINT) AS rank
             |  FROM dots)
             |SELECT query_id, rank, id, dot FROM ranked WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // Calibration bins of the hashed-linear quality score (q143's model,
    // scores in [-0.5, 0.5], 10 bins) against the length label: per-bin
    // exact counts, decimal-exact mean score, and positive rate — all
    // replayed token for token by the oracle's model re-derivation.
    Q("q220_calibration",
      (s, dir) => {
        val d = Tables.documents(s, dir).withColumn("s",
          graft.functions.ML.hashedLinearScore(col("text"), dim = 65536,
            salt = "qf").getField("score"))
        graft.functions.ML.calibrationBins(d, "s",
            label = length(col("text")) > 500, bins = 10,
            lo = -0.5, hi = 0.5)
          .orderBy("bin")
      },
      Some("""WITH toks AS (SELECT doc_id, length(text) > 500 AS lab,
             |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0) AS t
             |  FROM documents),
             |tw AS (SELECT doc_id, unnest(t) AS tok FROM toks),
             |w AS (SELECT doc_id,
             |    (CAST('0x' || substr(md5('qf' || tok), 1, 8) AS BIGINT) % 65536)
             |      % 100000 * 2654435761 % 1001 - 500 AS wt
             |  FROM tw),
             |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(wt) AS BIGINT) AS ws FROM w GROUP BY doc_id),
             |sc AS (SELECT d.doc_id, d.lab,
             |    CASE WHEN a.n IS NULL THEN 0.0
             |         ELSE CAST(a.ws AS DOUBLE) / (1000.0 * CAST(a.n AS DOUBLE)) END AS s
             |  FROM toks d LEFT JOIN agg a ON a.doc_id = d.doc_id),
             |b AS (SELECT LEAST(GREATEST(CAST(FLOOR((s - (-0.5)) / CAST(0.1 AS DOUBLE)) AS BIGINT), 0), 9) AS bin,
             |    s, lab FROM sc)
             |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             |  CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_score,
             |  CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin))
  )
}
