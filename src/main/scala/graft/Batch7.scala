package graft

import graft.SparkEntry.Q
import graft.functions.{Dedup, Packing, Sampling, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Query registry batch 7 (round 5): the training-data-pipeline surface
  * past pairwise dedup — near-dup CLUSTERS (connected components over the
  * pair graph), benchmark decontamination, deterministic hash-based
  * train/val/test splits, domain-mixture resampling, and greedy sequence
  * packing. Each runs through the library operator with a full DuckDB
  * oracle (connected components and the greedy packer via recursive CTEs).
  */
private[graft] object Batch7 {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** q33's shingle/pair SQL (3-gram Jaccard ≥ 0.3) as reusable CTE text. */
  private val pairCtes =
    """toks AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, GREATEST(len(t) - 2, 0) + 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |  FROM toks)""".stripMargin

  val queries: Seq[Q] = Seq(

    // Near-dup CLUSTERS: connected components over the exact-Jaccard pair
    // graph (q33's pairs), every doc assigned comp = min reachable doc_id
    // (singletons = self). The oracle computes the same fixpoint with a
    // recursive min-label-propagation CTE — same algorithm, independent
    // engine. This is the step that makes pairwise dedup output usable:
    // a~b~c chains collapse to ONE keep-candidate per cluster.
    // Pair generation runs the 8-byte hashShingles scale form; the oracle
    // recomputes the pairs from shingle STRINGS, so the green row also
    // cross-checks the hashed inverted index against the exact one
    // (the q67-vs-q36 pattern). maxDF is OFF here — fixture-only: the
    // hottest 3-gram spans ≤9 docs in this corpus, so the uncapped
    // inverted-index self-join is harmless, but at 100 TB it is quadratic
    // in the hottest shingle's doc frequency — a production pass sets
    // maxDF (the capped form is oracle-gated by q104).
    Q("q86_dedup_clusters",
      (s, dir) => {
        val d = docs(s, dir)
        val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.3,
          hashShingles = true)
        Dedup.clusters(d, "doc_id", pairs)
          .select(col("doc_id"), col("comp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $pairCtes,
             |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
             |pairs AS (SELECT i, j FROM inter
             |  JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
             |  WHERE CAST(n_common AS DOUBLE) / (si.sz + sj.sz - n_common) >= 0.3),
             |und AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs),
             |cc(node, comp) AS (
             |  SELECT a AS node, LEAST(a, MIN(b)) AS comp FROM und GROUP BY a
             |  UNION
             |  SELECT u.a AS node, c.comp FROM und u JOIN cc c ON c.node = u.b
             |  WHERE c.comp < u.a),
             |lab AS (SELECT node, MIN(comp) AS comp FROM cc GROUP BY node)
             |SELECT d.doc_id, COALESCE(l.comp, d.doc_id) AS comp
             |FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Benchmark decontamination scores: docs sharing ≥5 distinct 3-gram
    // shingles with the "benchmark" corpus (fixture: every 20th doc). The
    // flagged set is what Dedup.decontaminate anti-joins away; gating the
    // SCORES pins the overlap counting exactly, not just the survivor set.
    Q("q87_decontaminate",
      (s, dir) => {
        val d = docs(s, dir)
        val bench = d.filter(pmod(col("doc_id"), lit(20L)) === 0)
        val cand = d.filter(pmod(col("doc_id"), lit(20L)) =!= 0)
        Dedup.contaminationScores(cand, "doc_id", "text", bench, "text", n = 3)
          .filter(col("n_shared") >= 5)
          .select(col("id").as("doc_id"), col("n_shared"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $pairCtes,
             |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
             |cand AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0)
             |SELECT doc_id, COUNT(*) AS n_shared
             |FROM cand JOIN bench USING (s)
             |GROUP BY doc_id HAVING COUNT(*) >= 5
             |ORDER BY doc_id""".stripMargin)),

    // Bloom-prefiltered decontamination (round 11): q87's third bench-size
    // regime — the bench shingle set rides a broadcast BLOOM image (bits
    // per key) and the corpus stream is prefiltered in the scan by the
    // native bloom_might_contain expression; the exact verify join then
    // carries only probable hits and removes every false positive, so the
    // result is IDENTICAL to contaminationScores and the oracle is q87's
    // SQL VERBATIM. Green certifies the whole bloom path end-to-end:
    // build, broadcast transport, byte-image probe, FP-exact verify.
    Q("q127_decontaminate_bloom",
      (s, dir) => {
        val d = docs(s, dir)
        val bench = d.filter(pmod(col("doc_id"), lit(20L)) === 0)
        val cand = d.filter(pmod(col("doc_id"), lit(20L)) =!= 0)
        Dedup.contaminationScoresBloom(cand, "doc_id", "text", bench, "text",
            n = 3, fpp = 0.01)
          .filter(col("n_shared") >= 5)
          .select(col("id").as("doc_id"), col("n_shared"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $pairCtes,
             |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
             |cand AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0)
             |SELECT doc_id, COUNT(*) AS n_shared
             |FROM cand JOIN bench USING (s)
             |GROUP BY doc_id HAVING COUNT(*) >= 5
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic train/val/test split: band = the cumulative-weight
    // interval containing u32 = int(md5(salt‖id)[0:8]). The oracle
    // recomputes the hash and the exact integer cut points (⌊0.8·2^32⌋,
    // ⌊0.9·2^32⌋) — any engine gives every doc the same band forever.
    Q("q88_split_hash",
      (s, dir) => {
        Sampling.splitByHash(docs(s, dir), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s5")
          .select(col("doc_id"), col("split"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN u < 3435973836 THEN 'train'
             |       WHEN u < 3865470566 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |    CAST('0x' || substr(md5('s5' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS u
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Domain-mixture resampling to a uniform 5-language target: per-lang
    // keep fraction f = min(w·T/c, 1) with T = min(c/w) (largest feasible
    // total without upsampling), membership by the same salted-md5 integer
    // threshold. The oracle mirrors the arithmetic SHAPE exactly (c/w,
    // then w·T/c, both double) so the fractions — and therefore every
    // membership decision — are bit-identical.
    Q("q89_resample_mixture",
      (s, dir) => {
        Sampling.resampleToMixture(docs(s, dir), "lang", "doc_id",
            Map("en" -> 0.2, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.2),
            salt = "mix")
          .select(col("lang"), col("doc_id"))
          .orderBy("lang", "doc_id")
      },
      Some("""WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
             |tgt AS (SELECT * FROM (VALUES ('en', CAST(0.2 AS DOUBLE)),
             |    ('de', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.2 AS DOUBLE)),
             |    ('es', CAST(0.2 AS DOUBLE)), ('zh', CAST(0.2 AS DOUBLE))) t(lang, w)),
             |tmax AS (SELECT MIN(CAST(c AS DOUBLE) / w) AS T FROM cnt JOIN tgt USING (lang)),
             |frac AS (SELECT lang,
             |    LEAST(w * T / CAST(c AS DOUBLE), CAST(1.0 AS DOUBLE)) AS f
             |  FROM cnt JOIN tgt USING (lang), tmax)
             |SELECT d.lang, d.doc_id
             |FROM documents d JOIN frac USING (lang)
             |WHERE CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |  < CAST(floor(f * 4294967296.0) AS BIGINT)
             |ORDER BY d.lang, d.doc_id""".stripMargin)),

    // Greedy sequence packing: per language in doc_id order, fill
    // 256-token bins (oversized docs get their own bin). The oracle walks
    // the same greedy recurrence row-by-row with a recursive CTE — an
    // independent sequential implementation of the bin assignment the
    // distributed operator computes per partition run.
    Q("q90_pack_greedy",
      (s, dir) => {
        Packing.packGreedy(docs(s, dir), "lang", "doc_id",
            Text.tokenCount(col("text")), budget = 256)
          .select(col("lang"), col("doc_id"), col("n_tokens"), col("bin"))
          .orderBy("lang", "doc_id")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT lang, doc_id,
             |    CAST(len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0)) AS BIGINT) AS ntok,
             |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents),
             |walk(lang, rn, doc_id, ntok, bin, acc) AS (
             |  SELECT lang, rn, doc_id, ntok, CAST(0 AS BIGINT) AS bin, ntok AS acc
             |  FROM d WHERE rn = 1
             |  UNION ALL
             |  SELECT d.lang, d.rn, d.doc_id, d.ntok,
             |    CASE WHEN w.acc + d.ntok > 256 THEN w.bin + 1 ELSE w.bin END,
             |    CASE WHEN w.acc + d.ntok > 256 THEN d.ntok ELSE w.acc + d.ntok END
             |  FROM walk w JOIN d ON d.lang = w.lang AND d.rn = w.rn + 1)
             |SELECT lang, doc_id, ntok AS n_tokens, bin FROM walk
             |ORDER BY lang, doc_id""".stripMargin)),

    // Embedding near-dup CLUSTERS: the generic connected-components step
    // over COSINE pairs (q67's LSH-prefiltered exact-recheck scale path
    // feeds the same pairs→groups machinery as the Jaccard q86). The
    // oracle recomputes exact all-pairs cosine in decimal then the same
    // min-label fixpoint — green here certifies the whole chain:
    // RHP buckets → exact fix9 re-check → min-label clusters.
    Q("q91_embed_clusters",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).filter(col("label") === 0)
        val pairs = graft.functions.Similarity.cosinePairsLSH(
          e, "vec_id", "embedding", threshold = 0.25, dim = 64)
        Dedup.clusters(e, "vec_id", pairs)
          .select(col("vec_id"), col("comp"))
          .orderBy("vec_id")
      },
      Some("""WITH RECURSIVE e AS (SELECT vec_id AS id,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings WHERE label = 0),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm FROM e GROUP BY 1),
             |dots AS (SELECT a.id AS i, b.id AS j, SUM(a.vd * b.vd) AS dotd
             |  FROM e a JOIN e b ON a.pos = b.pos AND a.id < b.id GROUP BY 1, 2),
             |pairs AS (SELECT i, j FROM dots
             |  JOIN norms ni ON ni.id = i JOIN norms nj ON nj.id = j
             |  WHERE CAST(dotd AS DOUBLE) / (ni.nrm * nj.nrm) >= 0.25),
             |und AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs),
             |cc(node, comp) AS (
             |  SELECT a AS node, LEAST(a, MIN(b)) AS comp FROM und GROUP BY a
             |  UNION
             |  SELECT u.a AS node, c.comp FROM und u JOIN cc c ON c.node = u.b
             |  WHERE c.comp < u.a),
             |lab AS (SELECT node, MIN(comp) AS comp FROM cc GROUP BY node)
             |SELECT v.vec_id, COALESCE(l.comp, v.vec_id) AS comp
             |FROM (SELECT vec_id FROM embeddings WHERE label = 0) v
             |LEFT JOIN lab l ON l.node = v.vec_id
             |ORDER BY v.vec_id""".stripMargin)),

    // Deterministic N-per-group sample: the 20 docs per language whose
    // salted hash ranks lowest (hash, then id, a total order). The oracle
    // recomputes the identical md5 rank — same rows on any engine, any
    // partitioning, any retry.
    Q("q92_sample_per_group",
      (s, dir) => {
        Sampling.sampleNPerGroup(docs(s, dir), "lang", "doc_id", n = 20, salt = "q92")
          .select(col("lang"), col("doc_id"))
          .orderBy("lang", "doc_id")
      },
      Some("""SELECT lang, doc_id FROM (
             |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY CAST('0x' || substr(md5('q92' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
             |        doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 20
             |ORDER BY lang, doc_id""".stripMargin)),

    // Corpus vocab analysis: top 30 word 3-grams by DOCUMENT frequency
    // (per-doc distinct, ties broken by gram). One native-shingle pass +
    // one map-side-combined aggregate + TakeOrdered.
    Q("q93_ngram_vocab",
      (s, dir) => Text.topNgrams(docs(s, dir), "text", n = 3, k = 30),
      Some(s"""WITH $pairCtes
             |SELECT s AS gram, COUNT(*) AS doc_freq FROM sh
             |GROUP BY 1 ORDER BY doc_freq DESC, gram LIMIT 30""".stripMargin)),

    // Packed-sequence materialization: q90's bins with the member texts
    // concatenated in packing order — the actual training-sequence output.
    // The oracle runs the same recursive walk, joins the text back, and
    // string_aggs in the same order; gating md5 of the concatenated text
    // pins the member set, the order, and the separator placement exactly
    // while keeping the gated value newline-free (the driver's row hash
    // mishandles embedded \n\n separators in raw text columns).
    Q("q94_pack_texts",
      (s, dir) => {
        Packing.packTexts(docs(s, dir), "lang", "doc_id",
            Text.tokenCount(col("text")), "text", budget = 256)
          .select(col("lang"), col("bin"), col("n_docs"), col("tok_total"),
            md5(col("text")).as("text_md5"))
          .orderBy("lang", "bin")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT lang, doc_id, text,
             |    CAST(len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0)) AS BIGINT) AS ntok,
             |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents),
             |walk(lang, rn, doc_id, ntok, bin, acc) AS (
             |  SELECT lang, rn, doc_id, ntok, CAST(0 AS BIGINT) AS bin, ntok AS acc
             |  FROM d WHERE rn = 1
             |  UNION ALL
             |  SELECT d.lang, d.rn, d.doc_id, d.ntok,
             |    CASE WHEN w.acc + d.ntok > 256 THEN w.bin + 1 ELSE w.bin END,
             |    CASE WHEN w.acc + d.ntok > 256 THEN d.ntok ELSE w.acc + d.ntok END
             |  FROM walk w JOIN d ON d.lang = w.lang AND d.rn = w.rn + 1)
             |SELECT w.lang, w.bin, COUNT(*) AS n_docs,
             |  CAST(SUM(w.ntok) AS BIGINT) AS tok_total,
             |  md5(string_agg(d.text, e'\n\n' ORDER BY w.doc_id)) AS text_md5
             |FROM walk w JOIN d ON d.lang = w.lang AND d.doc_id = w.doc_id
             |GROUP BY w.lang, w.bin
             |ORDER BY w.lang, w.bin""".stripMargin))
  )
}
