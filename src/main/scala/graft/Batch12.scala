package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Query registry batch 12 (round 11, third session): corpus-pipeline
  * completions — chunk-level ("line-level") corpus dedup with document
  * reconstruction, feature-hashed linear classifier inference, the JSONL
  * source/sink round trip, incremental IVF index maintenance (append a
  * delta through saved centroids), and incremental exact dedup against a
  * persisted digest index.
  */
private[graft] object Batch12 {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** DuckDB tokenization CTE (Batch8's formulation verbatim — the oracle
    * image of Text.normalize + Text.tokens). */
  private val toksCte =
    """toks AS (SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
      |    x -> length(x) > 0) AS t
      |  FROM documents)""".stripMargin

  /** One JSONL copy of documents per fixture dir per JVM (the q131/q136
    * layout-fixture pattern): saveJsonl once, every q144 run reads it. */
  private object JsonlDocs {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    def forDir(s: SparkSession, dir: String): String =
      cache.getOrElseUpdate(dir, {
        val path = java.nio.file.Files.createTempDirectory("graft-jsonl-")
          .toAbsolutePath.toString + "/documents_jsonl"
        graft.sources.IO.saveJsonl(Tables.documents(s, dir), path)
        path
      })
  }

  /** One appended IVF index per fixture dir per JVM: train on the full
    * corpus (deterministic seed), BUILD the index from the even half,
    * APPEND the odd half through the saved model — the incremental-
    * maintenance drive q145 queries. */
  private object AppendedIvf {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, (String, String)]
    def forDir(s: SparkSession, dir: String): (String, String) =
      cache.getOrElseUpdate(dir, {
        val emb = Tables.embeddings(s, dir)
        val model = graft.functions.Similarity.trainIvf(
          emb, "embedding", nlist = 4, maxIter = 3)
        val root = java.nio.file.Files.createTempDirectory("graft-ivfapp-")
          .toAbsolutePath.toString
        val modelPath = s"$root/model"
        val corpusPath = s"$root/corpus"
        graft.functions.Similarity.saveIvf(model, modelPath, s)
        graft.functions.Similarity.writeIvfCorpus(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          model, corpusPath)
        val loaded = graft.functions.Similarity.loadIvf(s, modelPath)
        graft.functions.Similarity.ivfAppendCorpus(
          emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
          loaded, corpusPath)
        (modelPath, corpusPath)
      })
  }

  val queries: Seq[Q] = Seq(

    // Chunk-level corpus dedup (MassiveText/RefinedWeb line-level dedup,
    // with 16-token windows standing in for lines): any chunk content
    // seen earlier in the corpus — (doc_id, chunk_id) order — is removed
    // and each document reconstructed from its survivors. The oracle
    // re-derives the whole pipeline (q100's chunk grid at stride 16,
    // first-occurrence window, ordered string_agg reconstruction), so
    // the gate pins chunk boundaries, the global keep rule, within-doc
    // repeats, and the reconstruction order; all-dup docs collapse to ''
    // and zero-token docs pass through with 0 chunks.
    Q("q142_dedup_chunks",
      (s, dir) => graft.functions.Dedup.dedupChunks(docs(s, dir),
          "doc_id", "text", chunkSize = 16)
        .orderBy("doc_id"),
      Some(s"""WITH $toksCte,
             |meta AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n
             |  FROM toks WHERE len(t) > 0),
             |grid AS (SELECT doc_id, t, n,
             |    unnest(range(0, GREATEST((n + 15) // 16, 1))) AS chunk_id
             |  FROM meta),
             |chunks AS (SELECT doc_id, chunk_id,
             |    array_to_string(t[chunk_id * 16 + 1 : LEAST(chunk_id * 16 + 16, n)], ' ') AS ct
             |  FROM grid),
             |kept AS (SELECT doc_id, chunk_id, ct FROM (
             |    SELECT doc_id, chunk_id, ct, ROW_NUMBER() OVER (
             |      PARTITION BY ct ORDER BY doc_id, chunk_id) AS rn FROM chunks)
             |  WHERE rn = 1),
             |recon AS (SELECT doc_id,
             |    string_agg(ct, ' ' ORDER BY chunk_id) AS clean_text,
             |    CAST(COUNT(*) AS BIGINT) AS n_kept
             |  FROM kept GROUP BY doc_id),
             |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
             |  FROM chunks GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text,
             |  COALESCE(tot.n_chunks, 0) AS n_chunks,
             |  COALESCE(r.n_kept, 0) AS n_kept
             |FROM documents d
             |LEFT JOIN tot ON tot.doc_id = d.doc_id
             |LEFT JOIN recon r ON r.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Feature-hashed linear classifier INFERENCE (the fastText-style
    // quality-filter shape): each token hashes into one of 2^16 buckets
    // (salted md5 — the module's portable hash), bucket weights derive by
    // exact integer arithmetic, the doc score is the exact milli-unit sum
    // over tokens divided once at the end. The oracle recomputes hash,
    // bucket, weight, sum, division, and threshold — the entire inference
    // path is under the gate, not just the decision.
    Q("q143_hashed_classifier",
      (s, dir) => {
        val sc = graft.functions.ML.hashedLinearScore(col("text"),
          dim = 65536, salt = "m7")
        docs(s, dir).select(col("doc_id"),
            sc.getField("n_tokens").as("n_tokens"),
            sc.getField("w_sum").as("w_sum"),
            sc.getField("score").as("score"),
            (sc.getField("score") > 0.0).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $toksCte,
             |tw AS (SELECT doc_id, unnest(t) AS tok FROM toks),
             |w AS (SELECT doc_id,
             |    (CAST('0x' || substr(md5('m7' || tok), 1, 8) AS BIGINT) % 65536)
             |      % 100000 * 2654435761 % 1001 - 500 AS wt
             |  FROM tw),
             |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(wt) AS BIGINT) AS s FROM w GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(a.n, 0) AS n_tokens,
             |  COALESCE(a.s, 0) AS w_sum,
             |  CASE WHEN a.n IS NULL THEN 0.0
             |       ELSE CAST(a.s AS DOUBLE) / (1000.0 * CAST(a.n AS DOUBLE)) END AS score,
             |  CASE WHEN a.n IS NULL THEN FALSE
             |       ELSE CAST(a.s AS DOUBLE) / (1000.0 * CAST(a.n AS DOUBLE)) > 0.0 END AS keep
             |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // JSONL round trip: documents → saveJsonl → loadJsonl (explicit
    // schema, PERMISSIVE corrupt-record column) → per-lang aggregate with
    // a content signature (sum of each text's md5-u32 — order-independent
    // exact integers), vs the same aggregate over the parquet original.
    // Green certifies byte-exact text round-tripping through JSON
    // escaping, schema application, and zero corrupt rows; corrupt-line
    // HANDLING (a planted bad line landing in the corrupt column, not
    // killing the read) is IOStreamsSpec's job — no oracle can see a row
    // the fixture doesn't have.
    Q("q144_jsonl_roundtrip",
      (s, dir) => {
        val path = JsonlDocs.forDir(s, dir)
        val schema = Tables.documents(s, dir).schema
        val back = graft.sources.IO.loadJsonl(s, Seq(path), schema)
        back.groupBy("lang").agg(
            count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"),
            sum(graft.functions.Sampling.hashU32(col("text"), "")).as("text_sig"),
            sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(SUM(CAST('0x' || substr(md5('' || text), 1, 8) AS BIGINT)) AS BIGINT) AS text_sig,
             |  CAST(0 AS BIGINT) AS n_corrupt
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Incremental IVF index maintenance: the index is BUILT from the even
    // vec_ids and the odd half APPENDED through the persisted centroids
    // (ivfAppendCorpus — append-mode write into the cell layout, resident
    // files untouched; mtime-pinned in FunctionsSpec). nprobe = nlist +
    // exact scoring make the query exact, so the appended index must
    // answer q84's full-rebuild oracle VERBATIM — green certifies that
    // routing a delta through saved centroids lands every row in the cell
    // a rebuild would give it, end-to-end through the persisted layout.
    Q("q145_ivf_append",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val (modelPath, corpusPath) = AppendedIvf.forDir(s, dir)
        val model = graft.functions.Similarity.loadIvf(s, modelPath)
        graft.functions.Similarity.ivfTopKIndexed(corpusPath,
            emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
            "vec_id", "embedding", k = 7, nprobe = 4, model = model,
            excludeSelf = true, exact = true)
          .orderBy("query_id", "rank")
      },
      Some(Batch6.IvfExactSql)),

    // Incremental exact dedup against a persisted digest index: batch 1 =
    // the corpus, batch 2 = the corpus RE-KEYED (doc_id + 10000 — every
    // text a duplicate of something already admitted). Batch 1 must keep
    // exactly the one-shot first-occurrence set; batch 2 must come back
    // EMPTY — every decision made against the 32-byte digest index, the
    // corpus text never re-read. A fresh index per invocation keeps the
    // query self-contained (re-runs don't see a grown index).
    Q("q146_dedup_incremental",
      (s, dir) => {
        val idx = java.nio.file.Files.createTempDirectory("graft-dedupidx-")
          .toAbsolutePath.toString + "/digests"
        val d = docs(s, dir)
        val s1 = graft.functions.Dedup.exactIncremental(
          d, "doc_id", "text", idx)
        val s2 = graft.functions.Dedup.exactIncremental(
          d.withColumn("doc_id", col("doc_id") + 10000), "doc_id", "text", idx)
        s1.select(lit(1L).as("batch"), col("doc_id"))
          .union(s2.select(lit(2L).as("batch"), col("doc_id")))
          .orderBy("batch", "doc_id")
      },
      Some(IncrementalSql)),

    // TRUE line-level dedup (alignment-free — the fixed-window q142 form
    // only catches chunk-aligned duplicates): the corpus has no line
    // structure, so the fixture synthesizes it deterministically in BOTH
    // engines — every standalone token "the" becomes a newline — and
    // dedupLines removes every line whose exact content appeared earlier
    // anywhere in the corpus, then reassembles with the delimiter. The
    // md5 gate (q94 precedent: the driver's row hash mishandles embedded
    // newlines) pins the surviving line set, their order, and the
    // delimiter placement.
    Q("q147_dedup_lines",
      (s, dir) => {
        val lined = docs(s, dir).withColumn("text",
          regexp_replace(col("text"), "\\bthe\\b", "\n"))
        graft.functions.Dedup.dedupLines(lined, "doc_id", "text", delim = "\n")
          .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
            col("n_chunks"), col("n_kept"))
          .orderBy("doc_id")
      },
      Some("""WITH lined AS (SELECT doc_id,
             |    regexp_replace(text, '\bthe\b', chr(10), 'g') AS text FROM documents),
             |ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM lined),
             |raw AS (SELECT doc_id, unnest(arr) AS line,
             |    generate_subscripts(arr, 1) AS pos FROM ls),
             |lines AS (SELECT doc_id, line,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS line_id
             |  FROM raw WHERE length(line) > 0),
             |kept AS (SELECT doc_id, line_id, line FROM (
             |    SELECT doc_id, line_id, line, ROW_NUMBER() OVER (
             |      PARTITION BY line ORDER BY doc_id, line_id) AS rn FROM lines)
             |  WHERE rn = 1),
             |recon AS (SELECT doc_id,
             |    string_agg(line, chr(10) ORDER BY line_id) AS clean_text,
             |    CAST(COUNT(*) AS BIGINT) AS n_kept
             |  FROM kept GROUP BY doc_id),
             |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
             |  FROM lines GROUP BY doc_id)
             |SELECT d.doc_id, md5(COALESCE(r.clean_text, '')) AS clean_md5,
             |  COALESCE(tot.n_chunks, 0) AS n_chunks,
             |  COALESCE(r.n_kept, 0) AS n_kept
             |FROM documents d
             |LEFT JOIN tot ON tot.doc_id = d.doc_id
             |LEFT JOIN recon r ON r.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // STREAMING incremental dedup under q146's oracle verbatim: the same
    // two-batch drive (corpus, then the re-keyed corpus) delivered as
    // MemoryStream micro-batches through Streams.dedupSink — foreachBatch
    // runs exactIncremental against the PERSISTED digest index and lands
    // survivors tagged with their batch number. Green certifies the
    // batch/stream paths share one semantics: batch 1 keeps the one-shot
    // first-occurrence set, batch 2 is rejected row-for-row by index
    // lookups that survived the micro-batch boundary on disk.
    Q("q148_stream_dedup_sink",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val root = java.nio.file.Files.createTempDirectory("graft-sdedup-")
          .toAbsolutePath.toString
        val rows = docs(s, dir).select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        val ms = MemoryStream[(Long, String)](s)
        val q = graft.streaming.Streams.dedupSink(
            ms.toDS().toDF("doc_id", "text"), "doc_id", "text",
            s"$root/digests", s"$root/survivors")
          .option("checkpointLocation", s"$root/ckpt").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData(rows.toSeq.map { case (id, t) => (id + 10000L, t) })
          q.processAllAvailable()
        } finally q.stop()
        s.read.parquet(s"$root/survivors")
          .select(col("batch"), col("doc_id")).orderBy("batch", "doc_id")
      },
      Some(IncrementalSql)),

    // The END-TO-END curation pipeline as ONE gated query — the composition
    // a user of this library actually runs: Gopher quality gate (q97's
    // thresholds) → exact-dedup first-occurrence keep (q32's rule) →
    // benchmark decontamination (q87's bench set and ≥5-shingle rule,
    // bench members themselves excluded) → deterministic train/val/test
    // split (q88's salted-md5 bands) → per-(split, lang) corpus stats.
    // Each stage is individually gated elsewhere; this row gates their
    // COMPOSITION (operator chaining, no stage leaking rows into the
    // next), with the oracle re-deriving all four stages in one SQL chain.
    Q("q149_curation_pipeline",
      (s, dir) => {
        import graft.functions.{Dedup, Sampling, Text}
        val d = docs(s, dir)
        val gated = d.filter(Text.gopherKeep(col("text"),
          minTokens = 40, maxTokens = 100000, minMeanLen = 3.0,
          maxMeanLen = 10.0, minStopRatio = 0.02, maxDupFrac = 0.05))
        val firstIds = Dedup.exact(gated, "doc_id", "text")
          .select(col("rep_id").as("doc_id"))
        val deduped = gated.join(firstIds, Seq("doc_id"), "left_semi")
        val bench = d.filter(pmod(col("doc_id"), lit(20L)) === 0)
        val clean = Dedup.decontaminate(
          deduped.filter(pmod(col("doc_id"), lit(20L)) =!= 0), "doc_id", "text",
          bench, "text", n = 3, minShared = 5)
        Sampling.splitByHash(clean, "doc_id",
            Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), salt = "pipe")
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n"),
            sum(Text.tokenCount(col("text"))).as("sum_tokens"))
          .orderBy("split", "lang")
      },
      Some("""WITH toks AS (SELECT doc_id, lang, list_filter(
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |    x -> length(x) > 0) AS t
             |  FROM documents),
             |grams AS (SELECT doc_id, unnest(list_transform(
             |    range(1, GREATEST(len(t) - 1, 0) + 1), i -> t[i] || ' ' || t[i+1])) AS g
             |  FROM toks),
             |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2),
             |rep AS (SELECT doc_id, SUM(c) AS total, COUNT(*) AS dist FROM cnt GROUP BY 1),
             |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             |    CASE WHEN len(t) > 0 THEN CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) ELSE 0.0 END AS mean_wlen,
             |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('the','a','an','and','of','to','in','is','it'))) AS DOUBLE) / len(t) ELSE 0.0 END AS stop_ratio
             |  FROM toks),
             |gated AS (SELECT b.doc_id FROM base b LEFT JOIN rep r USING (doc_id)
             |  WHERE b.n_tokens >= 40 AND b.n_tokens <= 100000
             |    AND b.mean_wlen >= 3.0 AND b.mean_wlen <= 10.0
             |    AND b.stop_ratio >= 0.02
             |    AND (CASE WHEN COALESCE(r.total, 0) > 0
             |      THEN CAST(r.total - r.dist AS DOUBLE) / r.total ELSE 0.0 END) <= 0.05),
             |deduped AS (SELECT doc_id FROM (
             |    SELECT d.doc_id, ROW_NUMBER() OVER (
             |      PARTITION BY trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))
             |      ORDER BY d.doc_id) AS rn
             |    FROM documents d JOIN gated g ON g.doc_id = d.doc_id)
             |  WHERE rn = 1),
             |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
             |  FROM (SELECT doc_id,
             |      string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
             |    FROM documents)),
             |benchsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
             |contaminated AS (SELECT doc_id FROM sh JOIN benchsh USING (s)
             |  WHERE doc_id % 20 <> 0 GROUP BY doc_id HAVING COUNT(*) >= 5),
             |kept AS (SELECT doc_id FROM deduped
             |  WHERE doc_id % 20 <> 0
             |    AND doc_id NOT IN (SELECT doc_id FROM contaminated))
             |SELECT CASE WHEN u < 3865470566 THEN 'train'
             |       WHEN u < 4080218931 THEN 'val' ELSE 'test' END AS split,
             |  lang, COUNT(*) AS n, CAST(SUM(ntok) AS BIGINT) AS sum_tokens
             |FROM (SELECT t.doc_id, t.lang, CAST(len(t.t) AS BIGINT) AS ntok,
             |    CAST('0x' || substr(md5('pipe' || CAST(t.doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS u
             |  FROM toks t JOIN kept k ON k.doc_id = t.doc_id)
             |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin)),

    // Count-Min point-frequency estimates under the q43/q128 estimator
    // gate: the query builds the sketch (native mergeable aggregate),
    // probes every user id, and emits EXACT per-key counts plus an
    // in-query within-bound flag (est ≥ exact always; est ≤ exact +
    // eps·N — deterministic for a fixed seed and fixture); the oracle
    // recomputes the exact counts and asserts the flag. No engine can
    // replay another's counter grid; any engine can check the contract.
    Q("q150_countmin",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val est = graft.functions.Sketches.countMinEstimates(ev, "user_id",
          eps = 0.001, confidence = 0.999, seed = 42, keys = 0L until 150L)
        val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        est.join(exact, Seq("user_id"), "left")
          .select(col("user_id"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            (col("est") >= coalesce(col("n_exact"), lit(0L)) &&
              col("est") <= coalesce(col("n_exact"), lit(0L)) +
                ceil(col("total") * lit(0.001))).as("within_bound"))
          .orderBy("user_id")
      },
      Some("""WITH ks AS (SELECT generate_series AS user_id FROM generate_series(0, 149)),
             |ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
             |  FROM events GROUP BY 1)
             |SELECT k.user_id, COALESCE(ex.n_exact, 0) AS n_exact,
             |  TRUE AS within_bound
             |FROM ks k LEFT JOIN ex ON ex.user_id = k.user_id
             |ORDER BY k.user_id""".stripMargin))
  )

  /** q146/q148 shared oracle: the one-shot first-occurrence keep set,
    * batch-1-tagged (the re-keyed second batch must contribute nothing).
    * A def: referenced from `queries`, which initializes first. */
  private def IncrementalSql: String =
    """SELECT CAST(1 AS BIGINT) AS batch, doc_id FROM (
      |  SELECT doc_id, ROW_NUMBER() OVER (
      |    PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
      |    ORDER BY doc_id) AS rn
      |  FROM documents)
      |WHERE rn = 1
      |ORDER BY batch, doc_id""".stripMargin
}
