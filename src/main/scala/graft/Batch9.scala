package graft

import graft.SparkEntry.Q
import graft.functions.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Query registry batch 9 (round 7): verification-depth closers — the
  * round's work is making previously spec-only or fixture-only claims
  * oracle-measurable. q104 exercises the `maxDF` hot-key cap (the knob the
  * 100 TB skew story depends on) under the DuckDB gate; siblings here gate
  * the persisted-IVF path, ML.featuremat, the Partition sketch, and the
  * streaming curation pipeline's batch parity.
  */
private[graft] object Batch9 {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  val queries: Seq[Q] = Seq(

    // The hot-key cap under the oracle: jaccardPairs with maxDF=3 drops
    // every 3-gram present in >3 documents BEFORE the inverted-index
    // self-join — the skew guard that keeps the hottest shingle's doc list
    // from going quadratic at 100 TB. Jaccard is then DEFINED over the
    // surviving shingle universe (sz recounted post-cap), so the capped
    // run differs from q33's both in surviving pairs and in every value —
    // the oracle recomputes the whole pipeline over the HAVING-capped
    // universe, closing the one previously-unexercised link in the skew
    // story. (maxDF=3 / threshold=0.2 chosen so the cap visibly bites on
    // BOTH fixture scales: at sf0.001 three pairs drop vs the uncapped
    // run, at sf0.01 every jaccard value shifts.)
    Q("q104_dedup_jaccard_capped",
      (s, dir) => {
        Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3,
            threshold = 0.2, maxDF = 3)
          .orderBy("i", "j")
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
             |  FROM documents),
             |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
             |  FROM toks),
             |hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > 3),
             |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 ANTI JOIN hot USING (s)),
             |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT i, j, n_common,
             |  CAST(n_common AS DOUBLE) / (si.sz + sj.sz - n_common) AS jaccard
             |FROM inter
             |JOIN sizes si ON si.doc_id = i
             |JOIN sizes sj ON sj.doc_id = j
             |WHERE CAST(n_common AS DOUBLE) / (si.sz + sj.sz - n_common) >= 0.2
             |ORDER BY i, j""".stripMargin))
  )
}
