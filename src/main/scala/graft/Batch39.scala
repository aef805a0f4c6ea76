package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 39 (round 12): containment dedup — the
  * asymmetric near-dup relation (quotes/excerpts) Jaccard misses.
  */
private[graft] object Batch39 {

  val queries: Seq[Q] = Seq(

    // Containment pairs over the corpus plus injected QUOTE docs (every
    // tenth doc gets a child holding its first 12 normalized tokens):
    // each child is contained in its parent (c_ji = 1.0) while its
    // symmetric Jaccard is far below any useful threshold — the exact
    // relation this operator exists for. Index, intersection counts,
    // both containment directions, and the either-direction threshold
    // are all replayed.
    Q("q246_containment_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val quotes = Tables.documents(s, dir)
          .filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            array_join(slice(graft.functions.Text.tokens(col("text")), 1, 12), " ")
              .as("text"))
        graft.functions.Dedup.containmentPairs(docs.unionAll(quotes),
            "doc_id", "text", n = 3, threshold = 0.8)
          .orderBy("i", "j")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000,
             |    array_to_string((string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))[1:12], ' ')
             |  FROM documents WHERE doc_id % 10 = 0),
             |toks AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM base),
             |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
             |  FROM toks),
             |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, CAST(COUNT(*) AS BIGINT) AS n_common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
             |c AS (SELECT i, j, n_common,
             |    CAST(n_common AS DOUBLE) / CAST(si.sz AS DOUBLE) AS c_ij,
             |    CAST(n_common AS DOUBLE) / CAST(sj.sz AS DOUBLE) AS c_ji
             |  FROM inter JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j)
             |SELECT i, j, n_common, c_ij, c_ji FROM c
             |WHERE GREATEST(c_ij, c_ji) >= 0.8 ORDER BY i, j""".stripMargin))
  )
}
