package graft

import graft.SparkEntry.Q
import graft.functions.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Query registry batch 10 (round 8): scale-evidence round. q119 closes
  * the last decode stub — REAL pixel decode through JDK ImageIO, gated by
  * a closed-form synthetic-PNG oracle (the SQL recomputes what the codec
  * must return, so the gate proves the round-trip, not a byte checksum).
  */
private[graft] object Batch10 {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** Per-dir IVF×SQ8 code-index fixture (q125) — Batch6.IvfIndex's pattern:
    * train both models once, write the cell-partitioned CODE table once,
    * reuse across runs in this JVM. */
  private object IvfSq8Index {
    private val cache =
      scala.collection.concurrent.TrieMap.empty[String, (graft.functions.Similarity.IvfModel, graft.functions.Similarity.Sq8Model, String)]
    def forDir(s: SparkSession, dir: String): (graft.functions.Similarity.IvfModel, graft.functions.Similarity.Sq8Model, String) =
      cache.getOrElseUpdate(dir, {
        val emb = Tables.embeddings(s, dir)
        val ivf = graft.functions.Similarity.trainIvf(
          emb, "embedding", nlist = 4, maxIter = 3)
        val sq8 = graft.functions.Similarity.sq8Train(emb, "embedding")
        val path = java.nio.file.Files.createTempDirectory("graft-ivfsq8-")
          .toAbsolutePath.toString + "/codes"
        graft.functions.Similarity.writeIvfCorpusSq8(
          emb, "vec_id", "embedding", ivf, sq8, path)
        (ivf, sq8, path)
      })
  }

  val queries: Seq[Q] = Seq(

    // Real image decode under the oracle: every doc_id becomes a
    // deterministic PNG (pixel (x,y,c) = (id·31+7x+13y+29c) mod 256,
    // w = 8+id%5, h = 8+id%3), ImageIO decodes it back on the executors
    // (narrow map → flatMap, no shuffle), and the emitted per-channel
    // sums must equal the closed form the DuckDB oracle computes with no
    // image library at all. PNG is lossless, so any divergence — codec,
    // channel order, color management — turns the row red. Video frame
    // extraction remains the one documented stand-in (q85): the JDK has
    // image codecs but no video codecs.
    Q("q119_image_decode",
      (s, dir) => {
        import s.implicits._
        val ids = docs(s, dir).select(col("doc_id")).as[java.lang.Long]
        Multimodal.imageFeatures(Multimodal.syntheticImages(ids)).toDF()
          .select(col("media_id").as("doc_id"),
            col("width").cast("long").as("w"),
            col("height").cast("long").as("h"),
            col("sum_r"), col("sum_g"), col("sum_b"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, w, h,
             |  CAST(SUM((doc_id*31 + 7*x + 13*y) % 256) AS BIGINT) AS sum_r,
             |  CAST(SUM((doc_id*31 + 7*x + 13*y + 29) % 256) AS BIGINT) AS sum_g,
             |  CAST(SUM((doc_id*31 + 7*x + 13*y + 58) % 256) AS BIGINT) AS sum_b
             |FROM (SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h
             |      FROM documents),
             |  generate_series(0, 11) AS gx(x), generate_series(0, 9) AS gy(y)
             |WHERE x < w AND y < h
             |GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin)),

    // Real AUDIO decode under the oracle — q119's sibling for the second
    // JDK-native codec family: every doc_id becomes a deterministic WAV
    // (mono 16-bit PCM, sample i = (id·7+i·13) mod 4001 − 2000,
    // n = 500+id%250), javax.sound.sampled decodes it back on the
    // executors, and the emitted per-sample stats must equal the closed
    // form the DuckDB oracle computes with no audio library. PCM-in-WAV
    // is lossless, so any container/endianness/width bug turns the row
    // red. Lossy audio (mp3 etc.) needs external SPIs and sits with
    // video on the documented stand-in side of the decode boundary.
    Q("q120_audio_decode",
      (s, dir) => {
        import s.implicits._
        val ids = docs(s, dir).select(col("doc_id")).as[java.lang.Long]
        Multimodal.audioFeatures(Multimodal.syntheticAudio(ids)).toDF()
          .select(col("media_id").as("doc_id"), col("n_samples"),
            col("sum_abs"), col("max_abs"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_samples,
             |  CAST(SUM(ABS(((doc_id*7 + i*13) % 4001) - 2000)) AS BIGINT) AS sum_abs,
             |  CAST(MAX(ABS(((doc_id*7 + i*13) % 4001) - 2000)) AS BIGINT) AS max_abs
             |FROM (SELECT doc_id, 500 + doc_id % 250 AS n_samples
             |      FROM documents),
             |  generate_series(0, 749) AS g(i)
             |WHERE i < n_samples
             |GROUP BY doc_id, n_samples ORDER BY doc_id""".stripMargin)),

    // Watermarked windowed aggregation under the oracle — the last
    // spec-only streaming idiom (Streams.windowedAgg) converted to a
    // hash-green gate. A REAL two-micro-batch MemoryStream drive:
    // batch 1 is the whole events fixture; batch 2 is (a) a duplicate
    // copy of every earliest-hour row — now LATE, because the watermark
    // (delay 0 s) advanced to batch 1's max event time, far past that
    // window's end, so stateful aggregation must DROP them — plus (b)
    // one synthetic flush row 4 h past the fixture's last bucket, which
    // advances the watermark so every real window closes and append
    // mode emits it exactly once (the flush row's own window never
    // closes and is never emitted). The oracle is q39's batch SQL over
    // the original events verbatim: green certifies the three claims
    // that make event-time streaming correct at scale — late data
    // beyond the watermark is dropped (not double-counted), each window
    // is emitted exactly once with the batch-equal count AND
    // decimal-exact sum, and open windows are withheld. The driver-side
    // collect is the fixture feed only (MemoryStream needs in-memory
    // batches); the pipeline under test is the production streaming
    // form, whose state is bounded by the watermark (SCALE.md §streams).
    Q("q121_stream_window_late",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        import graft.streaming.Streams
        val rows = Tables.events(s, dir)
          .select(expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        val hourUs = 3600L * 1000000L
        val minBucketEnd = rows.map(_._1).min / hourUs * hourUs + hourUs
        val maxTs = rows.map(_._1).max
        require(minBucketEnd <= maxTs, "fixture must span more than one window")
        val late = rows.filter(_._1 < minBucketEnd)
        val flush = (maxTs / hourUs + 4) * hourUs + 1L
        val ms = MemoryStream[(Long, String, Double)](s)
        val out = Streams.windowedAgg(
          ms.toDS().toDF("ts_us", "event_type", "value"),
          watermark = "0 seconds", window_ = "1 hour")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q121_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData(late.toSeq :+ ((flush, "flush", 0.0))); q.processAllAvailable()
        } finally q.stop()
        s.table("q121_sink").orderBy("bucket_us", "event_type")
      },
      Some("""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin)),

    // Streaming windowed QUANTILES under the oracle — q121's sibling for
    // the sketch path (Streams.windowedQuantiles): per-(window, type)
    // KHist state is O(k) and mergeable, which is what makes quantiles
    // over an unbounded stream possible at all. Same MemoryStream drive
    // (batch 1 = the fixture, batch 2 = one flush row that closes every
    // real window). What this row gates is the STREAMING mechanics —
    // per-window `n` must equal the batch count exactly (state merged
    // across batches, watermark-closed, emitted exactly once) — plus
    // read-off sanity booleans: each sketch quantile inside the window's
    // batch-exact [min, max] envelope, and p50 ≤ p90 (the read-off is
    // monotone in q). The VALUE-accuracy contract is deliberately NOT
    // re-gated here: KHist merges equal values into weighted centroids,
    // and on a 3-row window like [.19, .19, 96.92] the centroid
    // interpolation legitimately strays far from quantile_cont (rank
    // mass spreads across the merged weight) — a fixed relative bound
    // would encode fixture luck, not the estimator's contract. Accuracy
    // lives where it is properly pinned: the KHist accuracy spec
    // (rank-error tracking vs exact percentiles at spec scale) and q43
    // (percentile_approx's rank contract under the oracle).
    Q("q122_stream_window_quantiles",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        import graft.streaming.Streams
        val ev = Tables.events(s, dir)
          .select(expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
        val rows = ev.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        val hourUs = 3600L * 1000000L
        val flush = (rows.map(_._1).max / hourUs + 4) * hourUs + 1L
        val ms = MemoryStream[(Long, String, Double)](s)
        val out = Streams.windowedQuantiles(
          ms.toDS().toDF("ts_us", "event_type", "value"),
          watermark = "0 seconds", window_ = "1 hour", k = 64, qs = Seq(0.5, 0.9))
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q122_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData((flush, "flush", 0.0)); q.processAllAvailable()
        } finally q.stop()
        val exact = ev
          .groupBy((floor(col("ts_us") / hourUs) * hourUs).cast("long").as("bucket_us"),
            col("event_type"))
          .agg(min(col("value")).as("emn"), max(col("value")).as("emx"))
        s.table("q122_sink").join(exact, Seq("bucket_us", "event_type"))
          .select(col("bucket_us"), col("event_type"), col("n"),
            (col("p50") >= col("emn") && col("p50") <= col("emx")).as("inb50"),
            (col("p90") >= col("emn") && col("p90") <= col("emx")).as("inb90"),
            (col("p50") <= col("p90")).as("mono"))
          .orderBy("bucket_us", "event_type")
      },
      Some("""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us, event_type,
             |  COUNT(*) AS n, TRUE AS inb50, TRUE AS inb90, TRUE AS mono
             |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin)),

    // The persisted-bucketed-index dedup path under the oracle — the
    // repeated-run form of q33: the (id, sz, shingle) inverted index is
    // written ONCE bucketed by shingle (IO.saveBucketed), and
    // jaccardPairsFromIndex self-joins the saved table with ZERO index
    // exchanges (bucketing co-partitions both sides — the IOStreamsSpec
    // plan test pins exactly one Exchange, the pair aggregate's). At
    // 100 TB this is how several thresholds/runs share one index build
    // instead of paying the lazy operator's per-run scan+explode. The
    // oracle is q33's SQL verbatim (same n=3, threshold=0.3), so green
    // certifies the saved-table path end-to-end: bucketed write, catalog
    // round-trip, co-partitioned self-join, identical pairs. The table
    // is dropped and rebuilt per run (the build is part of the measured
    // query — honest for a one-build-one-query drive; the operator's
    // point is that SUBSEQUENT queries skip it).
    Q("q123_dedup_jaccard_indexed",
      (s, dir) => {
        import graft.sources.IO
        val table = "graft_q123_idx"
        IO.dropManagedTable(s, table)
        val idx = graft.functions.Dedup.jaccardIndex(
          docs(s, dir), "doc_id", "text", n = 3)
        IO.saveBucketed(graft.core.JTable(idx, Seq("s")), table, 8)
        graft.functions.Dedup.jaccardPairsFromIndex(
            IO.loadBucketed(s, table).df, threshold = 0.3)
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

    // SQ8-quantized ANN under the oracle (round 11): the memory-side
    // scale lever — float32 corpus → 1 B/dim codes (4× smaller scans at
    // 100 TB) from a closed-form trainer (per-dim min/max, one aggregate
    // pass; no k-means). The oracle re-derives the ENTIRE pipeline in
    // SQL — ranges, codes (same pinned IEEE op order), decoded grid,
    // decimal-exact cosine, ranking — so green certifies train, encode,
    // decode, and quantized scoring end-to-end, not just the top-k ids.
    // Recall vs the exact float baseline is spec-gated (FunctionsSpec).
    Q("q124_ann_sq8",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.functions.Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, excludeSelf = true)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) AS pos,
             |    CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
             |dims AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM e GROUP BY 1),
             |codes AS (SELECT id, e.pos, v,
             |    CASE WHEN hi = lo THEN 0
             |         ELSE GREATEST(0, LEAST(255,
             |           CAST(FLOOR((v - lo) / (hi - lo) * 255.0 + 0.5) AS BIGINT))) END AS c
             |  FROM e JOIN dims ON e.pos = dims.pos),
             |dec AS (SELECT id, codes.pos,
             |    CAST(lo + c * ((hi - lo) / 255.0) AS DECIMAL(12,9)) AS vd
             |  FROM codes JOIN dims ON codes.pos = dims.pos),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm
             |  FROM dec GROUP BY 1),
             |dots AS (SELECT q.id AS query_id, c2.id AS id, SUM(q.vd * c2.vd) AS dotd
             |  FROM dec q JOIN dec c2 ON q.pos = c2.pos AND q.id < 5 AND c2.id <> q.id
             |  GROUP BY 1, 2),
             |scored AS (SELECT dots.query_id, dots.id,
             |    CAST(dotd AS DOUBLE) / (nq.nrm * nc.nrm) AS cos
             |  FROM dots JOIN norms nq ON nq.id = dots.query_id
             |  JOIN norms nc ON nc.id = dots.id),
             |ranked AS (SELECT query_id, id, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, id ASC) AS BIGINT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, id, cos FROM ranked WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // IVF×SQ8 composed index under the oracle (round 11): q124's pipeline
    // THROUGH a persisted cell-partitioned CODE table — encode at write,
    // hive cell layout, isin-pruned read, decode at read, grid scoring.
    // nprobe = nlist probes every cell (q84's gate pattern), so the result
    // must be bit-identical to q124's and the oracle is q124's SQL
    // VERBATIM — green certifies the whole persisted quantized index, not
    // just the in-memory math. Partial-probe recall + actual partition
    // pruning are FunctionsSpec's job (not SQL-expressible).
    Q("q125_ann_ivf_sq8",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val (ivf, sq8, path) = IvfSq8Index.forDir(s, dir)
        graft.functions.Similarity.ivfTopKIndexedSq8(path,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 10, nprobe = 4, ivf = ivf, sq8 = sq8, excludeSelf = true)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) AS pos,
             |    CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
             |dims AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM e GROUP BY 1),
             |codes AS (SELECT id, e.pos, v,
             |    CASE WHEN hi = lo THEN 0
             |         ELSE GREATEST(0, LEAST(255,
             |           CAST(FLOOR((v - lo) / (hi - lo) * 255.0 + 0.5) AS BIGINT))) END AS c
             |  FROM e JOIN dims ON e.pos = dims.pos),
             |dec AS (SELECT id, codes.pos,
             |    CAST(lo + c * ((hi - lo) / 255.0) AS DECIMAL(12,9)) AS vd
             |  FROM codes JOIN dims ON codes.pos = dims.pos),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm
             |  FROM dec GROUP BY 1),
             |dots AS (SELECT q.id AS query_id, c2.id AS id, SUM(q.vd * c2.vd) AS dotd
             |  FROM dec q JOIN dec c2 ON q.pos = c2.pos AND q.id < 5 AND c2.id <> q.id
             |  GROUP BY 1, 2),
             |scored AS (SELECT dots.query_id, dots.id,
             |    CAST(dotd AS DOUBLE) / (nq.nrm * nc.nrm) AS cos
             |  FROM dots JOIN norms nq ON nq.id = dots.query_id
             |  JOIN norms nc ON nc.id = dots.id),
             |ranked AS (SELECT query_id, id, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, id ASC) AS BIGINT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, id, cos FROM ranked WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // ADC — asymmetric SQ8 (round 11): only the corpus is quantized (the
    // side that must shrink at 100 TB); queries score at full precision,
    // halving quantization noise per dot product. The oracle mixes the
    // precisions exactly as the operator does: query side = raw values
    // rounded once to decimal(12,9) (q37's form), corpus side = the SQ8
    // grid — so green certifies the asymmetric scoring path itself, not
    // an approximation of it.
    Q("q126_ann_sq8_adc",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.functions.Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, excludeSelf = true, asymmetric = true)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) AS pos,
             |    CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
             |dims AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM e GROUP BY 1),
             |codes AS (SELECT id, e.pos, v,
             |    CASE WHEN hi = lo THEN 0
             |         ELSE GREATEST(0, LEAST(255,
             |           CAST(FLOOR((v - lo) / (hi - lo) * 255.0 + 0.5) AS BIGINT))) END AS c
             |  FROM e JOIN dims ON e.pos = dims.pos),
             |dec AS (SELECT id, codes.pos,
             |    CAST(lo + c * ((hi - lo) / 255.0) AS DECIMAL(12,9)) AS vd
             |  FROM codes JOIN dims ON codes.pos = dims.pos),
             |qe AS (SELECT id, pos, CAST(v AS DECIMAL(12,9)) AS vd
             |  FROM e WHERE id < 5),
             |cnorms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm
             |  FROM dec GROUP BY 1),
             |qnorms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm
             |  FROM qe GROUP BY 1),
             |dots AS (SELECT q.id AS query_id, c2.id AS id, SUM(q.vd * c2.vd) AS dotd
             |  FROM qe q JOIN dec c2 ON q.pos = c2.pos AND c2.id <> q.id
             |  GROUP BY 1, 2),
             |scored AS (SELECT dots.query_id, dots.id,
             |    CAST(dotd AS DOUBLE) / (nq.nrm * nc.nrm) AS cos
             |  FROM dots JOIN qnorms nq ON nq.id = dots.query_id
             |  JOIN cnorms nc ON nc.id = dots.id),
             |ranked AS (SELECT query_id, id, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, id ASC) AS BIGINT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, id, cos FROM ranked WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // HyperLogLog approximate distinct under the oracle (round 11) — the
    // q43 estimator-gate pattern: no engine can recompute another's HLL
    // registers, but any engine can check the estimate's ERROR CONTRACT
    // against the exact answer. The query emits the exact per-group
    // distinct count plus an in-query flag asserting the HLL++ estimate
    // (rsd=0.02) landed within 4·rsd of it; the oracle recomputes the
    // exact count and asserts the flag is 1. Green certifies the
    // register-merge pipeline's estimate honors its contract on real
    // grouped data — the 100 TB distinct-count shape (fixed 2^p buffer
    // per group, map-side combine, no shuffle of distinct values).
    Q("q128_approx_distinct",
      (s, dir) => {
        val est = graft.functions.Sketches.approxDistinct(col("user_id"), rsd = 0.02)
          .cast("double")
        val exact = count_distinct(col("user_id")).cast("double")
        Tables.events(s, dir).groupBy("event_type")
          .agg(count_distinct(col("user_id")).as("n_exact"),
            (abs(est - exact) <= exact * 0.08).cast("long").as("within_bound"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
             |  CAST(1 AS BIGINT) AS within_bound, COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))
  )
}
