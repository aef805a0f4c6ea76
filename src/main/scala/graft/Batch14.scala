package graft

import graft.SparkEntry.Q
import graft.functions.{ML, Retrieval}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Query registry batch 14 (round 11, fourth session, second wave):
  * ML featurization — grouped rank features and leave-one-out target
  * encoding — plus sparse tf·idf cosine pair similarity (the lexical
  * member of the near-dup scoring family).
  */
private[graft] object Batch14 {

  val queries: Seq[Q] = Seq(

    // Grouped rank features: percentile rank ((rank−1)/(n−1), ties share
    // values) and decile (ntile over a unique-tiebroken order) of each
    // order's price within its priority class. The oracle re-derives both
    // window functions — the rank arithmetic, the tie semantics, and
    // ntile's balanced-bucket split are all under the gate.
    Q("q162_rank_features",
      (s, dir) => {
        ML.rankFeatures(Tables.orders(s, dir), Seq("o_orderpriority"),
            "o_totalprice", tieCols = Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("pct_rank"), col("decile"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  CASE WHEN n = 1 THEN 0.0 ELSE
             |    CAST(r - 1 AS DOUBLE) / (n - 1) END AS pct_rank,
             |  decile
             |FROM (
             |  SELECT o_orderkey, o_orderpriority,
             |    RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC) AS r,
             |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n,
             |    CAST(NTILE(10) OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS decile
             |  FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // Leave-one-out target encoding of order priority by order price:
    // each row encodes as the mean price of the OTHER rows in its
    // priority class — (Σ_cat − own)/(n_cat − 1), decimal-exact sums,
    // one subtraction + one division per row. The oracle recomputes
    // every encoded value, so the aggregate, the self-exclusion, and
    // the division are all gated (the singleton/global fallback is
    // spec territory — this fixture has no singleton class).
    Q("q163_target_encode",
      (s, dir) => {
        ML.targetEncodeLoo(Tables.orders(s, dir), "o_orderpriority",
            "o_totalprice")
          .select(col("o_orderkey"), col("o_orderpriority"), col("te"))
          .orderBy("o_orderkey")
      },
      Some("""WITH cat AS (SELECT o_orderpriority,
             |    CAST(COUNT(*) AS BIGINT) AS cn,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS cs
             |  FROM orders GROUP BY 1)
             |SELECT o_orderkey, o_orderpriority,
             |  CAST(cs - CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) / (cn - 1) AS te
             |FROM orders JOIN cat USING (o_orderpriority)
             |ORDER BY o_orderkey""".stripMargin)),

    // Sparse tf·idf cosine pairs over 3-gram terms (maxDF=20 — the
    // Dedup-family cap dropping df-hot grams that cost O(df²) pairs and
    // contribute ~zero idf weight): the oracle re-derives tokenization,
    // the shingle grid, tf, the capped df, the log-free weights, the
    // decimal-exact norms and pair dots, and the thresholded cosines.
    Q("q164_tfidf_cosine",
      (s, dir) => {
        Retrieval.tfidfCosinePairs(Tables.documents(s, dir), "doc_id", "text",
            threshold = 0.5, gram = 3, maxDF = 20L)
          .orderBy("i", "j")
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |    x -> length(x) > 0) AS t FROM documents),
             |sh AS (SELECT doc_id AS id, unnest(list_transform(
             |    range(1, GREATEST(len(t)-2,0)+1),
             |    i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS term FROM toks),
             |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
             |tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM sh GROUP BY 1, 2),
             |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
             |  GROUP BY 1 HAVING COUNT(*) <= 20),
             |w AS (SELECT id, term, CAST(tf AS DOUBLE) * s.n_docs / df AS w
             |  FROM tf JOIN dfq USING (term) CROSS JOIN stats s),
             |norms AS (SELECT id,
             |    sqrt(CAST(SUM(CAST(w * w AS DECIMAL(28,10))) AS DOUBLE)) AS nrm
             |  FROM w GROUP BY 1),
             |dots AS (SELECT a.id AS i, b.id AS j,
             |    CAST(SUM(CAST(a.w * b.w AS DECIMAL(28,10))) AS DOUBLE) AS dot
             |  FROM w a JOIN w b ON a.term = b.term AND a.id < b.id GROUP BY 1, 2)
             |SELECT i, j, dot / (ni.nrm * nj.nrm) AS cos
             |FROM dots JOIN norms ni ON ni.id = i JOIN norms nj ON nj.id = j
             |WHERE dot / (ni.nrm * nj.nrm) >= 0.5
             |ORDER BY i, j""".stripMargin))
  )
}
