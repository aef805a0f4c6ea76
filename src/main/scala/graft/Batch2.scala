package graft

import graft.SparkEntry.Q
import graft.core.{JTable, Sel}
import graft.operators.{Aggregations => A, Joins, NDSparse, Reshape}
import graft.functions.{Dedup, Multimodal, Similarity, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Query registry batch 2: reshape, NDSparse veneer, set ops, grouping
  * sets, and the LLM-data-pipeline operators (text analysis, dedup,
  * similarity, multimodal, streaming-equivalent windowing).
  */
private[graft] object Batch2 {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val queries: Seq[Q] = Seq(

    // §2.11 stack — wide→long melt via the codegen'd stack generator.
    Q("q17_stack",
      (s, dir) => {
        Reshape.stack(JTable(li(s, dir).filter(col("l_orderkey") <= 500)),
          Seq("l_orderkey", "l_linenumber"),
          Seq("l_quantity", "l_discount", "l_tax"))
          .orderBy("l_orderkey", "l_linenumber", "variable")
      },
      Some("""SELECT l_orderkey, l_linenumber, variable, value FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem WHERE l_orderkey <= 500
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem WHERE l_orderkey <= 500
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem WHERE l_orderkey <= 500)
             |ORDER BY l_orderkey, l_linenumber, variable""".stripMargin)),

    // §2.11 unstack — long→wide pivot with an explicit domain (one shuffle).
    Q("q18_unstack",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = Reshape.unstack(JTable(ev(s, dir)), Seq("user_id"),
          "event_type", "event_id", pivotValues = types, agg = c => count(c))
        // pivot yields NULL for absent (user, type) combos; the COUNT(*)
        // FILTER oracle yields 0 — normalize
        types.foldLeft(wide)((d, t) => d.withColumn(t, coalesce(col(t), lit(0L))))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
             |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
             |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // §2.11 flatten — explode a vector cell, position-preserving.
    Q("q19_flatten",
      (s, dir) => {
        Reshape.flatten(JTable(Tables.embeddings(s, dir).filter(col("vec_id") < 50)),
          "embedding", Seq("vec_id"))
          .withColumn("pos", col("pos").cast("long"))
          .orderBy("vec_id", "pos")
      },
      Some("""SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             |  unnest(embedding) AS elem
             |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin)),

    // §2.2 NDSparse getindex — range slice on the leading index dim
    // (partition pruning does the reference's bounding-box chunk skip).
    Q("q20_nd_slice",
      (s, dir) => {
        val nd = NDSparse(li(s, dir), Seq("l_orderkey", "l_linenumber"),
          Seq("l_quantity", "l_extendedprice"))
        nd.sliceRange("l_orderkey", 100, 110).table.df
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
             |WHERE l_orderkey BETWEEN 100 AND 110
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // §2.4 NDSparse reducedim — drop a dim, aggregate over kept dims.
    Q("q21_nd_reducedim",
      (s, dir) => {
        val nd = NDSparse(ev(s, dir), Seq("event_type", "user_id"), Seq("value"))
        nd.reducedim(Seq("user_id"),
          "n" -> count(lit(1)), "sum_value" -> dsum(col("value"), 4)).table.df
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // §2.2 NDSparse convertdim — map a dim through a function, agg collisions.
    Q("q22_nd_convertdim",
      (s, dir) => {
        val nd = NDSparse(ev(s, dir), Seq("user_id"), Seq("value"))
        nd.convertdim("user_id", u => pmod(u, lit(10L)),
          "n" -> count(lit(1)), "sum_value" -> dsum(col("value"), 4)).table.df
          .withColumnRenamed("user_id", "user_bucket")
          .orderBy("user_bucket")
      },
      Some("""SELECT user_id % 10 AS user_bucket, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin)),

    // §2.3 NDSparse broadcast — elementwise op across two keyed arrays
    // joined on the shared dim (share-of-total per event type).
    Q("q23_nd_broadcast",
      (s, dir) => {
        val byType = NDSparse(
          ev(s, dir).groupBy("user_id", "event_type").agg(count(lit(1)).as("n")),
          Seq("user_id", "event_type"), Seq("n"))
        val totals = NDSparse(
          ev(s, dir).groupBy("user_id").agg(count(lit(1)).as("total")),
          Seq("user_id"), Seq("total"))
        byType.broadcastOp(totals, (a, b) => a.cast("double") / b.cast("double"), "share")
          .table.df.orderBy("user_id", "event_type")
      },
      Some("""SELECT a.user_id, a.event_type,
             |  CAST(a.n AS DOUBLE) / CAST(b.total AS DOUBLE) AS share
             |FROM (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2) a
             |JOIN (SELECT user_id, COUNT(*) AS total FROM events GROUP BY 1) b
             |  ON a.user_id = b.user_id
             |ORDER BY a.user_id, a.event_type""".stripMargin)),

    // §2.4 grouping sets (parity-plus): rollup with deterministic null order.
    Q("q24_rollup",
      (s, dir) => {
        li(s, dir).rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // §2.4 cube (parity-plus).
    Q("q25_cube",
      (s, dir) => {
        li(s, dir).cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // §2.7 intersect (parity-plus; reference lacks it).
    Q("q26_intersect",
      (s, dir) => {
        val r = li(s, dir).filter(col("l_returnflag") === "R").select("l_orderkey")
        val a = li(s, dir).filter(col("l_returnflag") === "A").select("l_orderkey")
        r.intersect(a).orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
             |INTERSECT
             |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
             |ORDER BY l_orderkey""".stripMargin)),

    // §2.7 except (parity-plus).
    Q("q27_except",
      (s, dir) => {
        val r = li(s, dir).filter(col("l_returnflag") === "R").select("l_orderkey")
        val a = li(s, dir).filter(col("l_returnflag") === "A").select("l_orderkey")
        r.except(a).orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
             |EXCEPT
             |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
             |ORDER BY l_orderkey""".stripMargin)),

    // Text analysis: token counts + subword counts + mean token length.
    Q("q28_text_stats",
      (s, dir) => {
        docs(s, dir).select(col("doc_id"),
          Text.tokenCount(col("text")).as("n_tokens"),
          Text.subwordCount(col("text")).as("n_subwords"),
          Text.meanTokenLen(col("text")).as("mean_tok_len"))
          .orderBy("doc_id")
      },
      // toks mirrors Text.tokens' empty-token filter; mean_tok_len mirrors
      // the Spark-side 0.0 guard for token-less docs.
      Some("""WITH n AS (SELECT doc_id,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
             |    lower(text) AS lt FROM documents),
             |t AS (SELECT doc_id, norm, lt,
             |    list_filter(string_split(norm, ' '), x -> length(x) > 0) AS toks FROM n)
             |SELECT doc_id,
             |  CAST(len(toks) AS BIGINT) AS n_tokens,
             |  CAST(len(regexp_extract_all(lt, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subwords,
             |  CASE WHEN len(toks) > 0
             |    THEN CAST(len(replace(norm, ' ', '')) AS DOUBLE) / len(toks)
             |    ELSE 0.0 END AS mean_tok_len
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Text quality score: composite formula, single-rounding determinism.
    Q("q29_text_quality",
      (s, dir) => {
        docs(s, dir).select(col("doc_id"),
          Text.qualityScore(col("text")).as("quality"))
          .orderBy("doc_id")
      },
      // guards mirror Text.punctRatio/stopwordRatio: degenerate docs score
      // 0.0 instead of NaN (NaN ordering differs between engines).
      Some(s"""WITH n AS (SELECT doc_id,
              |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents),
              |t AS (SELECT doc_id, norm,
              |    list_filter(string_split(norm, ' '), x -> length(x) > 0) AS toks,
              |    CASE WHEN length(norm) > 0
              |      THEN CAST(len(regexp_extract_all(norm, '[.,;:!?''"()-]')) AS DOUBLE) / length(norm)
              |      ELSE 0.0 END AS punct
              |  FROM n)
              |SELECT doc_id,
              |  LEAST(CAST(length(norm) AS DOUBLE) / 200.0, 1.0)
              |    * (1.0 - punct)
              |    * CASE WHEN len(toks) > 0
              |        THEN LEAST(CAST(len(list_filter(toks, x -> x IN (${Text.stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) / len(toks) * 5.0, 1.0)
              |        ELSE 0.0 END
              |  AS quality
              |FROM t ORDER BY doc_id""".stripMargin)),

    // Language ID: CJK detection + stopword-marker argmax.
    Q("q30_text_langid",
      (s, dir) => {
        docs(s, dir).select(col("doc_id"),
          Text.langId(col("text")).as("pred_lang"), col("lang"))
          .orderBy("doc_id")
      },
      Some {
        def hits(ws: Seq[String]) =
          s"len(list_filter(toks, x -> x IN (${ws.map("'" + _ + "'").mkString(",")})))"
        val Seq(en, de, fr, es) = Text.markerWords.map(m => hits(m._2))
        Some(s"""WITH n AS (SELECT doc_id, lang, text,
                |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                |  FROM documents)
                |SELECT doc_id,
                |  CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
                |       WHEN $es > GREATEST($en, $de, $fr) THEN 'es'
                |       WHEN $fr > GREATEST($en, $de) THEN 'fr'
                |       WHEN $de > $en THEN 'de'
                |       ELSE 'en' END AS pred_lang,
                |  lang
                |FROM n ORDER BY doc_id""".stripMargin)
      }.get),

    // Document fingerprint: positional polynomial hash (ASCII subset).
    Q("q31_text_fingerprint",
      (s, dir) => {
        docs(s, dir).filter(col("lang") === "en")
          .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT doc_id,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
             |  FROM documents WHERE lang = 'en')
             |SELECT doc_id,
             |  CAST(list_sum(list_transform(range(1, length(norm) + 1),
             |    i -> i * unicode(norm[i]))) % 1000000007 AS BIGINT) AS fp
             |FROM n ORDER BY doc_id""".stripMargin)),

    // Dedup: exact (hash-groupBy on normalized text digest).
    Q("q32_dedup_exact",
      (s, dir) => {
        Dedup.exact(docs(s, dir), "doc_id", "text").orderBy("text_hash")
      },
      Some("""SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_hash,
             |  MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin)),

    // Dedup: exact n-gram Jaccard via inverted index (candidate pairs =
    // docs sharing a shingle; no cartesian product anywhere).
    Q("q33_dedup_jaccard",
      (s, dir) => {
        Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.3)
          .orderBy("i", "j")
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
             |  FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
             |  FROM toks),
             |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT i, j, n_common,
             |  CAST(n_common AS DOUBLE) / (si.sz + sj.sz - n_common) AS jaccard
             |FROM inter
             |JOIN sizes si ON si.doc_id = i
             |JOIN sizes sj ON sj.doc_id = j
             |WHERE CAST(n_common AS DOUBLE) / (si.sz + sj.sz - n_common) >= 0.3
             |ORDER BY i, j""".stripMargin)),

    // Dedup: MinHash+LSH (scale path). Round 6: full oracle — the
    // signature pipeline (positional shingle hash mod P → (a·h+b) mod P
    // permutation minima) is plain SQL list arithmetic, and BANDING is
    // expressed semantically: the oracle joins on band-slice VALUES where
    // the operator joins on xxhash64(band, slice) — identical output
    // unless a 64-bit bucket hash collision ADDS a candidate (none on
    // this fixture, and est_sim verification filters most). min over
    // hashes is duplicate-insensitive, so hash-set vs string-set shingle
    // dedup cannot diverge either. ASCII-fixture assumption: unicode()
    // codepoints == Java UTF-16 code units.
    Q("q34_dedup_minhash",
      (s, dir) => {
        Dedup.minhashLSH(docs(s, dir), "doc_id", "text", n = 3,
          bands = 8, rowsPerBand = 2, minEstSim = 0.25)
          .orderBy("i", "j")
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |    x -> length(x) > 0) AS t
             |  FROM documents),
             |elig AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
             |sh AS (SELECT doc_id, list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gs
             |  FROM elig),
             |hs AS (SELECT doc_id, list_transform(gs,
             |    g -> list_sum(list_transform(range(1, length(g) + 1),
             |      j -> j * unicode(g[j:j]))) % 1000000007) AS hh
             |  FROM sh),
             |sig AS (SELECT doc_id, list_transform(range(0, 16),
             |    i -> list_min(list_transform(hh,
             |      h -> (h * (2*i + 1) + 104729 * (i + 1)) % 1000000007))) AS sig
             |  FROM hs),
             |bands AS (SELECT doc_id, unnest(range(0, 8)) AS b, sig FROM sig),
             |keyed AS (SELECT doc_id, b, sig[2*b + 1] AS h1, sig[2*b + 2] AS h2, sig FROM bands),
             |cand AS (SELECT DISTINCT a.doc_id AS i, c.doc_id AS j, a.sig AS asig, c.sig AS csig
             |  FROM keyed a JOIN keyed c
             |    ON a.b = c.b AND a.h1 = c.h1 AND a.h2 = c.h2 AND a.doc_id < c.doc_id)
             |SELECT i, j,
             |  CAST(len(list_filter(range(1, 17), p -> asig[p] = csig[p])) AS DOUBLE) / 16 AS est_sim
             |FROM cand
             |WHERE CAST(len(list_filter(range(1, 17), p -> asig[p] = csig[p])) AS DOUBLE) / 16 >= 0.25
             |ORDER BY i, j""".stripMargin)),

    // Dedup: SimHash near-dup pairs. Round 6: full oracle — per-token
    // positional hash mod P, the 2654435761 scramble (h < P and the
    // multiplier keep the product under 2^63, so NO 64-bit wrap to
    // emulate), per-bit majority votes, and the 15-bit block buckets all
    // lower to SQL integer/list arithmetic. votes > 0 ⟺ 2·ones > tokens.
    Q("q35_dedup_simhash",
      (s, dir) => {
        Dedup.simhashPairs(docs(s, dir), "doc_id", "text",
          nBlocks = 4, maxHamming = 3)
          .orderBy("i", "j")
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |    x -> length(x) > 0) AS t
             |  FROM documents),
             |tokh AS (SELECT doc_id, list_transform(t,
             |    tok -> (list_sum(list_transform(range(1, length(tok) + 1),
             |      j -> j * unicode(tok[j:j]))) % 1000000007) * 2654435761) AS sc,
             |    len(t) AS n
             |  FROM toks WHERE len(t) >= 1),
             |sig AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 62), bit ->
             |    CASE WHEN len(list_filter(sc, v -> (v // (CAST(1 AS BIGINT) << bit)) % 2 = 1)) * 2 > n
             |      THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)) AS BIGINT) AS sig
             |  FROM tokh),
             |blocks AS (SELECT doc_id, sig, unnest(range(0, 4)) AS blk FROM sig),
             |keyed AS (SELECT doc_id, sig, blk,
             |    (sig // (CAST(1 AS BIGINT) << (blk * 15))) % 32768 AS bv FROM blocks),
             |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
             |    bit_count(xor(a.sig, b.sig)) AS hamming
             |  FROM keyed a JOIN keyed b
             |    ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id)
             |SELECT i, j, CAST(hamming AS BIGINT) AS hamming FROM cand
             |WHERE hamming <= 3
             |ORDER BY i, j""".stripMargin)),

    // Embedding-cosine near-dup pairs, DECIMAL-exact accumulation.
    Q("q36_embed_cosine_pairs",
      (s, dir) => {
        Similarity.cosinePairsExact(
          Tables.embeddings(s, dir).filter(col("label") === 0),
          "vec_id", "embedding", threshold = 0.25)
          .orderBy("i", "j")
      },
      Some("""WITH e AS (SELECT vec_id AS id,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings WHERE label = 0),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm FROM e GROUP BY 1),
             |dots AS (SELECT a.id AS i, b.id AS j, SUM(a.vd * b.vd) AS dotd
             |  FROM e a JOIN e b ON a.pos = b.pos AND a.id < b.id GROUP BY 1, 2)
             |SELECT i, j, CAST(dotd AS DOUBLE) / (ni.nrm * nj.nrm) AS cos
             |FROM dots JOIN norms ni ON ni.id = i JOIN norms nj ON nj.id = j
             |WHERE CAST(dotd AS DOUBLE) / (ni.nrm * nj.nrm) >= 0.25
             |ORDER BY i, j""".stripMargin)),

    // Similarity: brute-force cosine top-k THROUGH the library operator
    // (broadcast query set, one corpus scan, decimal-exact scoring so the
    // values hash-match the relational oracle below — which keeps the
    // pos-join form only as DuckDB SQL, never as a Spark plan).
    Q("q37_embed_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, excludeSelf = true, exact = true)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id AS id,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm FROM e GROUP BY 1),
             |dots AS (SELECT q.id AS query_id, c.id AS id, SUM(q.vd * c.vd) AS dotd
             |  FROM e q JOIN e c ON q.pos = c.pos AND q.id < 5 AND c.id <> q.id
             |  GROUP BY 1, 2),
             |scored AS (SELECT dots.query_id, dots.id,
             |    CAST(dotd AS DOUBLE) / (nq.nrm * nc.nrm) AS cos
             |  FROM dots JOIN norms nq ON nq.id = dots.query_id
             |  JOIN norms nc ON nc.id = dots.id),
             |ranked AS (SELECT query_id, id, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS BIGINT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, id, cos FROM ranked WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // Multimodal: binary payload → partition-batched feature extraction
    // (typed Dataset + mapPartitions; decode stubbed deterministically).
    Q("q38_multimodal_features",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(s,
          docs(s, dir).filter(col("lang") === "en"))
        Multimodal.extractFeatures(media).toDF().orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
             |  CAST(unicode(text[1]) AS BIGINT) AS first_byte,
             |  CAST(list_sum(list_transform(range(1, length(text) + 1),
             |    i -> i * unicode(text[i]))) % 1000000007 AS BIGINT) AS checksum
             |FROM documents WHERE lang = 'en' ORDER BY media_id""".stripMargin)),

    // Streaming-equivalent: event-time tumbling window aggregation (the
    // batch twin of the Structured Streaming pipeline in streaming/).
    Q("q39_stream_window",
      (s, dir) => {
        val withTs = ev(s, dir)
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("tstamp", timestamp_micros(col("ts_us")))
        withTs.groupBy(
            unix_micros(window(col("tstamp"), "1 hour").getField("start")).as("bucket_us"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("sum_value"))
          .orderBy("bucket_us", "event_type")
      },
      Some("""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin)),

    // OnlineStats Hist: fixed-bin histogram as a grouped count.
    Q("q40_hist",
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bin")
      },
      Some("""SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin, COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin)),

    // OnlineStats CountMap: value→count table.
    Q("q41_countmap",
      (s, dir) => {
        ev(s, dir).groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n FROM events
             |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // OnlineStats Mean/Variance: moments via deterministic decimal sums.
    Q("q42_moments",
      (s, dir) => {
        val sumd = sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        val sumsq = sum((col("l_quantity") * col("l_quantity")).cast("decimal(18,4)")).cast("double")
        val n = count(lit(1))
        li(s, dir).groupBy("l_returnflag")
          .agg(n.as("n"), (sumd / n).as("mean"),
            ((sumsq - sumd * sumd / n) / (n - lit(1))).as("variance"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean,
             |  (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |     * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
             |  / (COUNT(*) - 1) AS variance
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // §2.4 groupby vector-function: grouped median ESTIMATOR (the KHist /
    // percentile_approx path) gated by its own accuracy contract.
    // Estimator values differ across engines, so the estimate itself can't
    // be hashed — instead the query emits the exact median (q51 proves
    // percentile == DuckDB quantile_cont on this fixture) plus an in-query
    // `within_bound` flag: percentile_approx(accuracy=100) guarantees rank
    // error ≤ n/100, so the returned order statistic must lie between the
    // exact 0.48 and 0.52 quantiles (±0.01 widened by one interpolation
    // step on each side). The oracle asserts the flag is 1 — a broken or
    // drifting estimator turns the row red instead of invisible.
    Q("q43_groupby_median",
      (s, dir) => {
        val est = percentile_approx(col("l_quantity"), lit(0.5), lit(100)).cast("double")
        val lo = percentile(col("l_quantity"), lit(0.48))
        val hi = percentile(col("l_quantity"), lit(0.52))
        A.groupby(JTable(li(s, dir)), Seq("l_returnflag"),
          "median_exact" -> percentile(col("l_quantity"), lit(0.5)),
          "within_bound" -> (est >= lo && est <= hi).cast("long"),
          "n" -> count(lit(1)))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_exact,
             |  CAST(1 AS BIGINT) AS within_bound, COUNT(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // §2.2 selector language: Regex + Type + Between selectors.
    Q("q44_selectors",
      (s, dir) => {
        JTable(li(s, dir))
          .select(Sel("l_orderkey"), Sel("l_linenumber"),
            Sel.Re("price$".r), Sel.OfType(StringType))
          .df.orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag, l_linestatus
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // §2.3 merge — order-preserving union of two keyed slices.
    Q("q45_merge",
      (s, dir) => {
        val lo = JTable(Tables.orders(s, dir).filter(col("o_totalprice") < 150000), Seq("o_orderkey"))
        val hi = JTable(Tables.orders(s, dir).filter(col("o_totalprice") >= 150000), Seq("o_orderkey"))
        val m = Joins.merge(lo, hi)
        m.df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // §2.3 semi join (parity-plus): orders with any heavy lineitem.
    Q("q46_join_semi",
      (s, dir) => {
        val heavy = JTable(li(s, dir).filter(col("l_quantity") > 45)
          .withColumnRenamed("l_orderkey", "o_orderkey"))
        val sj = Joins.join(JTable(Tables.orders(s, dir)), heavy,
          Seq("o_orderkey"), Seq("o_orderkey"), how = "semi")
        sj.groupBy("o_orderstatus").agg(count(lit(1)).as("n")).orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
             |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin))
  )
}
