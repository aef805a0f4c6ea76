package graft

import graft.SparkEntry.Q
import graft.core.JTable
import graft.operators.{Joins, NDSparse}
import graft.functions.Sketches
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Query registry batch 6 (round 4): the last spec-only-to-oracle
  * conversions — the salted asof join's hot-id fixture, the groupjoin size
  * fast path, `reducedim_vec`, the implicit `1:n` index, keyed upsert, and
  * the space-saving count map in its exact regime.
  */
private[graft] object Batch6 {

  /** q84's exact-IVF oracle (nprobe = nlist degenerates the index to
    * brute-force over the fix9/decimal image). Shared verbatim by q145:
    * an index built on half the corpus and APPENDED with the other half
    * must answer identically to this full-rebuild derivation. */
  private[graft] val IvfExactSql: String =
    """WITH e AS (SELECT vec_id AS id,
      |    generate_subscripts(embedding, 1) - 1 AS pos,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
      |  FROM embeddings),
      |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm FROM e GROUP BY 1),
      |dots AS (SELECT q.id AS query_id, c.id AS id, SUM(q.vd * c.vd) AS dotd
      |  FROM e q JOIN e c ON q.pos = c.pos AND q.id >= 5 AND q.id < 10 AND c.id <> q.id
      |  GROUP BY 1, 2),
      |scored AS (SELECT dots.query_id, dots.id,
      |    CAST(dotd AS DOUBLE) / (nq.nrm * nc.nrm) AS cos
      |  FROM dots JOIN norms nq ON nq.id = dots.query_id
      |  JOIN norms nc ON nc.id = dots.id),
      |ranked AS (SELECT query_id, id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT query_id, rank, id, cos FROM ranked WHERE rank <= 7
      |ORDER BY query_id, rank""".stripMargin

  /** One persisted IVF index per fixture dir per JVM — the "train once,
    * query forever" production shape q84 exercises: trainIvf → saveIvf +
    * writeIvfCorpus into a temp dir at first use; every subsequent q84
    * run (bench iterations, repeated Verify calls) goes straight to the
    * persisted artifacts. Correctness does not depend on the cache: the
    * fixed seed makes training deterministic, and q84 probes every cell
    * (nprobe = nlist), which is exact for ANY centroid set. */
  private object IvfIndex {
    private val cache =
      scala.collection.concurrent.TrieMap.empty[String, (String, String)]
    def forDir(s: SparkSession, dir: String): (String, String) =
      cache.getOrElseUpdate(dir, {
        val emb = Tables.embeddings(s, dir)
        val model = graft.functions.Similarity.trainIvf(
          emb, "embedding", nlist = 4, maxIter = 3)
        val root = java.nio.file.Files.createTempDirectory("graft-ivf-")
          .toAbsolutePath.toString
        val modelPath = s"$root/model"
        val corpusPath = s"$root/corpus"
        graft.functions.Similarity.saveIvf(model, modelPath, s)
        graft.functions.Similarity.writeIvfCorpus(emb, "vec_id", "embedding",
          model, corpusPath)
        (modelPath, corpusPath)
      })
  }

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def ord(s: SparkSession, dir: String) = Tables.orders(s, dir)

  val queries: Seq[Q] = Seq(

    // §2.3 asofjoin through the SALTED skew fallback (Joins.asofJoinSalted)
    // on a HOT-id fixture: user_id % 3 folds every event onto three ids,
    // each ~33% of the table — the single-window-task shape the salted
    // operator exists for. Hour buckets (µs time) split each id's window;
    // the cross-bucket carry join repairs rows whose match lives in an
    // earlier bucket. Times compare at µs on BOTH sides (`ts div 1000`;
    // DuckDB's parquet read truncates ns→µs, so ns-precision comparisons
    // could disagree at sub-µs boundaries). The oracle mirrors asof-left
    // semantics as a window over the range join, with the same
    // duplicate-time tiebreak as the operator (max right-value struct).
    Q("q78_asof_salted",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("uid", pmod(col("user_id"), lit(3L)))
          .withColumn("tus", expr("ts div 1000"))
        val l = ev.filter(col("event_type") === "purchase")
        val r = ev.filter(col("event_type") === "click")
          .select(col("uid"), col("tus"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        Joins.asofJoinSalted(l, r, Seq("uid"), "tus", "tus",
            lCols = Seq("event_id", "value"),
            rValueCols = Seq("click_id", "click_value"),
            bucketOf = t => (t / lit(3600000000L)).cast("long")) // 1h in µs
          .select(col("event_id"), col("uid"), col("click_id"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id % 3 AS uid, epoch_us(ts) AS tus,
             |    event_type, value FROM events),
             |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
             |c AS (SELECT * FROM e WHERE event_type = 'click')
             |SELECT event_id, uid, click_id, click_value FROM (
             |  SELECT p.event_id, p.uid, c.event_id AS click_id, c.value AS click_value,
             |    ROW_NUMBER() OVER (PARTITION BY p.event_id
             |      ORDER BY c.tus DESC, c.event_id DESC, c.value DESC) AS rn
             |  FROM p LEFT JOIN c ON p.uid = c.uid AND c.tus <= p.tus) t
             |WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // §2.4 reducedim_vec (reference `src/reduce.jl:117-134`): drop a dim,
    // merge each kept-key group by a VECTOR aggregate — exact interpolating
    // median of quantities per linestatus, through NDSparse.reducedimVec →
    // Aggregations.groupbyVector (q51 covers the Column-percentile fast
    // path; this row covers the collect+array lowering itself). Quantities
    // are integral-valued doubles, so both engines' interpolation is exact
    // (q65 precedent).
    Q("q79_reducedim_vec",
      (s, dir) => {
        val median: Column => Column =
          graft.operators.Aggregations.medianCol(_, assumeSorted = true)
        val nd = NDSparse(li(s, dir), Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
        nd.reducedimVec(Seq("l_returnflag"), "l_quantity", median, as = "median_qty")
          .table.df.orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus, quantile_cont(l_quantity, 0.5) AS median_qty
             |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // Keyed upsert (the `setindex!`/`insert_row!` divergence as an
    // operator, reference `src/indexing.jl:47-86`): right-wins merge by
    // pkey — updates replace whole rows on key match, right-only keys
    // insert. Update rows double the price AND rewrite the name, proving
    // whole-row (not per-column) replacement.
    Q("q80_upsert",
      (s, dir) => {
        val cols = Seq(col("p_partkey"), col("p_name"), col("p_retailprice"))
        val base = JTable(Tables.part(s, dir).select(cols: _*), Seq("p_partkey"))
        val hit = Tables.part(s, dir).filter(pmod(col("p_partkey"), lit(10L)) === 0)
        val updates = JTable(
          hit.select(col("p_partkey"), lit("updated").as("p_name"),
              (col("p_retailprice") * 2).as("p_retailprice"))
            .unionByName(hit.select((col("p_partkey") + 1000000L).as("p_partkey"),
              col("p_name"), col("p_retailprice"))),
          Seq("p_partkey"))
        Joins.upsert(base, updates).df.orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  CASE WHEN p_partkey % 10 = 0 THEN 'updated' ELSE p_name END AS p_name,
             |  CASE WHEN p_partkey % 10 = 0 THEN p_retailprice * 2 ELSE p_retailprice END AS p_retailprice
             |FROM part
             |UNION ALL
             |SELECT p_partkey + 1000000 AS p_partkey, p_name, p_retailprice
             |FROM part WHERE p_partkey % 10 = 0
             |ORDER BY p_partkey""".stripMargin)),

    // §2.1 implicit 1:n index (reference `loadndsparse` with no index cols,
    // `src/io.jl:19-29`; `offset_index!` renumbering `src/io.jl:151-154`):
    // rows numbered in global pkey order via the partition-offset
    // zipWithIndex (JTable.withRowIndex — no single-task window), then a
    // point-range lookup on the synthesized dimension.
    Q("q81_implicit_index",
      (s, dir) => {
        val t = JTable(
          li(s, dir).select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          Seq("l_orderkey", "l_linenumber"))
        val nd = NDSparse(t.withRowIndex("idx"), Seq("idx"),
          Seq("l_orderkey", "l_linenumber", "l_quantity"))
        nd.sliceRange("idx", 1001L, 1100L).table.df
          .select(col("idx"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy("idx")
      },
      Some("""SELECT idx, l_orderkey, l_linenumber, l_quantity FROM (
             |  SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS idx,
             |    l_orderkey, l_linenumber, l_quantity
             |  FROM lineitem)
             |WHERE idx BETWEEN 1001 AND 1100 ORDER BY idx""".stripMargin)),

    // §2.3 groupjoin size fast path: q09's group-size distribution through
    // Joins.groupjoinSize — count(*) per key instead of
    // collect_list(struct(...)), same oracle as q09 (the q09/q82 bench
    // pair shows the nested-payload shuffle is q09's cost, not the join's).
    Q("q82_groupjoin_count",
      (s, dir) => {
        val liKeyed = li(s, dir).withColumnRenamed("l_orderkey", "o_orderkey")
        val gj = Joins.groupjoinSize(JTable(ord(s, dir)), JTable(liKeyed),
          Seq("o_orderkey"), how = "left", as = "n_items")
        gj.select(col("o_orderkey"), col("n_items"))
          .groupBy("n_items").agg(count(lit(1)).as("n_orders"))
          .orderBy("n_items")
      },
      Some("""SELECT n_items, COUNT(*) AS n_orders FROM (
             |  SELECT o_orderkey, CAST(COUNT(l_orderkey) AS BIGINT) AS n_items
             |  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY o_orderkey)
             |GROUP BY n_items ORDER BY n_items""".stripMargin)),

    // Space-saving count map THROUGH the Aggregator in its exact regime
    // (distinct keys ≤ capacity → counts exact, error bounds zero — same
    // gate pattern as q69; the adversarial heavy-hitter guarantee is the
    // FunctionsSpec's job, estimates not being SQL-expressible).
    Q("q83_countmap_ss",
      (s, dir) => {
        Tables.events(s, dir)
          .agg(Sketches.spaceSavingCol(1000)(col("event_type")).as("m"))
          .select(explode(col("m")).as("e"))
          .select(col("e.key").as("event_type"), col("e.count").as("n"),
            col("e.err").as("err"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n, CAST(0 AS BIGINT) AS err
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // IVF ANN through the PRODUCTION path — train once, query forever:
    // the quantizer is trained + saved and the corpus written in the
    // cell-partitioned index layout ONCE per fixture dir (IvfIndex below;
    // the k-means fit runs in that setup step, NOT in this query's plan),
    // then the query itself does loadIvf → ivfTopKIndexed over the
    // persisted index — probed `cell=` directories pruned at the scan.
    // nprobe = nlist probes every cell, so the approximate operator
    // degenerates to exact search — the oracle certifies the whole
    // persisted pipeline (save/load round-trip, partitioned index,
    // probe explode, cell join, ranking) independent of where k-means
    // put the centroids. exact=true scores with the fix9 fixed-point
    // image, hash-matching the decimal oracle (q37's form). Approximate
    // recall at nprobe < nlist — and in-memory ivfTopK equivalence — is
    // FunctionsSpec's job, not SQL-expressible.
    Q("q84_ivf_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val (modelPath, corpusPath) = IvfIndex.forDir(s, dir)
        val model = graft.functions.Similarity.loadIvf(s, modelPath)
        graft.functions.Similarity.ivfTopKIndexed(corpusPath,
            emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
            "vec_id", "embedding", k = 7, nprobe = 4, model = model,
            excludeSelf = true, exact = true)
          .orderBy("query_id", "rank")
      },
      Some(IvfExactSql)),

    // Multimodal frame sampling THROUGH the flatMap/UDTF shape: payloads
    // chunked into 256-byte frames, every 2nd frame emitted with its
    // positional checksum (q38's byte math per frame). The oracle mirrors
    // the chunking with a correlated generate_series — ASCII fixture, so
    // DuckDB's char positions == payload byte positions (q38 precedent).
    Q("q85_frame_sample",
      (s, dir) => {
        val media = graft.functions.Multimodal.mediaFromDocuments(s,
          Tables.documents(s, dir).filter(col("lang") === "en"))
        graft.functions.Multimodal.frameSample(media, frameBytes = 256, stride = 2)
          .toDF().orderBy("media_id", "frame_idx")
      },
      Some("""SELECT doc_id AS media_id, f.frame_idx,
             |  CAST(strlen(substr(text, CAST(f.frame_idx * 256 + 1 AS BIGINT), 256)) AS BIGINT) AS n_bytes,
             |  CAST(list_sum(list_transform(
             |    range(1, strlen(substr(text, CAST(f.frame_idx * 256 + 1 AS BIGINT), 256)) + 1),
             |    i -> i * unicode(substr(text, CAST(f.frame_idx * 256 + 1 AS BIGINT), 256)[i])))
             |    % 1000000007 AS BIGINT) AS checksum
             |FROM documents,
             |  (SELECT generate_series AS frame_idx
             |   FROM generate_series(0, 65534, 2)) f -- covers 16.7 MB docs; a longer
             |   -- payload would (correctly) go red here rather than silently truncate
             |WHERE lang = 'en' AND f.frame_idx * 256 < strlen(text)
             |ORDER BY media_id, frame_idx""".stripMargin))
  )
}
