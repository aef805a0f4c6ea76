package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Query registry batch 16 (round 11, fourth session, fifth wave): the
  * ORC source/sink round trip (completing the format family next to
  * CSV/parquet/JSONL/JDBC) and skip-gram co-occurrence counts (the
  * word2vec/GloVe training-pair preparation).
  */
private[graft] object Batch16 {

  /** One ORC copy of documents per fixture dir per JVM (the q144 JSONL
    * fixture pattern). */
  private object OrcDocs {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    def forDir(s: SparkSession, dir: String): String =
      cache.getOrElseUpdate(dir, {
        val path = java.nio.file.Files.createTempDirectory("graft-orc-")
          .toAbsolutePath.toString + "/documents_orc"
        Tables.documents(s, dir).write.mode("overwrite").orc(path)
        path
      })
  }

  val queries: Seq[Q] = Seq(

    // ORC round trip under q144's gate design: documents → ORC → read
    // back → per-lang aggregate with an order-independent md5-u32
    // content signature, vs the same aggregate over the parquet
    // original. Green certifies byte-exact round-tripping through the
    // second columnar format Spark ships (no oracle can read ORC
    // directly — the signature carries the content equality).
    Q("q170_orc_roundtrip",
      (s, dir) => {
        val back = s.read.orc(OrcDocs.forDir(s, dir))
        back.groupBy("lang").agg(
            count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"),
            sum(graft.functions.Sampling.hashU32(col("text"), "")).as("text_sig"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(SUM(CAST('0x' || substr(md5('' || text), 1, 8) AS BIGINT)) AS BIGINT) AS text_sig
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Skip-gram co-occurrence table (window=2): every (center, context)
    // pair within ±2 positions, counted corpus-wide. The oracle
    // re-derives pair generation positionally (a position self-join —
    // the relational formulation kept ONLY as oracle SQL; the operator
    // is a narrow per-row expression) and every count.
    Q("q171_skipgrams",
      (s, dir) => {
        graft.functions.Text.skipgramPairs(
            Tables.documents(s, dir), "text", window = 2)
          .orderBy("center", "context")
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |    x -> length(x) > 0) AS t FROM documents),
             |p AS (SELECT doc_id, unnest(t) AS tok,
             |    generate_subscripts(t, 1) AS i FROM toks)
             |SELECT a.tok AS center, b.tok AS context,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM p a JOIN p b ON b.doc_id = a.doc_id
             |  AND b.i BETWEEN a.i - 2 AND a.i + 2 AND b.i <> a.i
             |GROUP BY 1, 2 ORDER BY center, context""".stripMargin))
  )
}
