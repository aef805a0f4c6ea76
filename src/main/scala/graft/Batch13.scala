package graft

import graft.SparkEntry.Q
import graft.functions.{Retrieval, Similarity}
import graft.operators.{Joins, TimeSeries}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query registry batch 13 (round 11, fourth session): the retrieval +
  * maintenance wave — BM25 keyword search, hybrid (lexical × vector)
  * reciprocal-rank fusion, SemDeDup semantic dedup, regular-grid time
  * resampling with gap fill, the salted general equi-join, and
  * incremental aggregate maintenance (batch upsert + streaming sink).
  */
private[graft] object Batch13 {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** DuckDB image of Text.normalize + Text.tokens (Batch8's formulation
    * verbatim), parameterized by the source expression. */
  private def toksOf(expr: String): String =
    s"""list_filter(
       |    string_split(trim(regexp_replace(lower($expr), '\\s+', ' ', 'g')), ' '),
       |    x -> length(x) > 0)""".stripMargin

  /** The shared BM25 derivation (corpus stats → tf → df over query terms →
    * pinned-IEEE per-term score → decimal-exact per-doc sum → ranking),
    * parameterized by the query-set VALUES rows and k. Mirrors
    * Retrieval.bm25Scores operation for operation — see its scaladoc for
    * the order-pinning contract. */
  private def bm25Sql(queryValues: String, k: Int): String =
    s"""WITH dt AS (SELECT doc_id AS id, ${toksOf("text")} AS t FROM documents),
       |dl AS (SELECT id, t, CAST(len(t) AS BIGINT) AS dl FROM dt),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
       |tfx AS (SELECT id, dl, unnest(t) AS term FROM dl),
       |tfg AS (SELECT id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tfx GROUP BY 1, 2, 3),
       |q(query_id, qtext) AS (VALUES $queryValues),
       |qt AS (SELECT query_id, unnest(list_distinct(${toksOf("qtext")})) AS term FROM q),
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfg
       |  WHERE term IN (SELECT term FROM qt) GROUP BY 1),
       |sc AS (SELECT qt.query_id, tfg.id,
       |    ((s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |    ((tfg.tf * (1.2 + 1.0)) / (tfg.tf + 1.2 * ((1.0 - 0.75) +
       |      0.75 * (CAST(tfg.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))) AS s_term
       |  FROM tfg JOIN dfq d USING (term) JOIN qt ON qt.term = tfg.term
       |  CROSS JOIN stats s),
       |agg AS (SELECT query_id, id,
       |    CAST(SUM(CAST(s_term AS DECIMAL(25,12))) AS DOUBLE) AS score
       |  FROM sc GROUP BY 1, 2),
       |ranked AS (SELECT query_id, id, score, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, id ASC) AS BIGINT) AS rank
       |  FROM agg)""".stripMargin

  /** events day bucket: Spark sees int64 nanos (Tables.events contract),
    * DuckDB sees µs timestamps — ts_ns div 86400e12 ≡ epoch_us // 86400e6
    * exactly (the normalization is ×1000). */
  private val DayNs = 86400000000000L

  private def dayAgg(df: DataFrame): DataFrame = df
    .withColumn("day", expr(s"ts div ${DayNs}L"))
    .groupBy("day", "user_id")
    .agg(count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,4)")).as("sum_value"))

  /** Mergeable-exact algebra for the day rollup: long counts add; decimal
    * sums add exactly and re-cast to the STORED precision so the table
    * schema is stable across upserts (Spark widens decimal(18,4) +
    * decimal(18,4) to (19,4); writing that back would fork the parquet
    * schema partition-by-partition). */
  private val dayMerge: Seq[(String, (Column, Column) => Column)] = Seq(
    "n" -> ((a, b) => a + b),
    "sum_value" -> ((a, b) => (a + b).cast("decimal(18,4)")))

  private def readRollup(s: SparkSession, dirP: String): DataFrame =
    s.read.parquet(dirP)
      // the hive partition value parses as int; the logical column is long
      .select(col("day").cast("long").as("day"), col("user_id"),
        col("n"), col("sum_value").cast("double").as("sum_value"))
      .orderBy("day", "user_id")

  /** q156/q157 shared oracle: the from-scratch day rollup any sequence of
    * exact mergeable upserts must converge to. */
  private def IvmSql: String =
    """SELECT epoch_us(ts) // 86400000000 AS day, user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, user_id""".stripMargin

  val queries: Seq[Q] = Seq(

    // BM25 keyword search: two free-text queries against the corpus, per-
    // query top-10 by the log-free Robertson score. The oracle re-derives
    // the ENTIRE scoring pipeline — corpus stats (N, Σdl), per-(doc,term)
    // tf, per-term df over the query vocabulary, the pinned-IEEE per-term
    // score, the decimal-exact per-doc sum, and the ranking — so tf
    // aggregation, idf, length normalization, and tie-breaking are all
    // under the gate, not just the returned ids.
    Q("q151_bm25_topk",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((1L, "spark window merge"),
          (2L, "customer query stream table")).toDF("query_id", "qtext")
        Retrieval.bm25TopK(docs(s, dir), "doc_id", "text",
            qs, "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(bm25Sql(
        "(CAST(1 AS BIGINT), 'spark window merge'), " +
          "(CAST(2 AS BIGINT), 'customer query stream table')", 10) +
        "\nSELECT query_id, rank, id, score FROM ranked WHERE rank <= 10" +
        "\nORDER BY query_id, rank")),

    // Hybrid retrieval: BM25 over the documents (lexical) fused with
    // exact-cosine ANN over the embeddings (vector) by reciprocal-rank
    // fusion — doc_id and vec_id share the fixture id space, the standard
    // hybrid-search setup (one corpus, two indexes). The oracle re-derives
    // BOTH rankings (the q151 BM25 chain; the q37 exact-cosine chain) and
    // the fusion arithmetic 1/(60+r_lex) + 1/(60+r_vec), so list
    // membership, both rank orders, and the fused re-ranking are gated.
    Q("q152_hybrid_rrf",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0L, "spark window merge stream")).toDF("query_id", "qtext")
        val lex = Retrieval.bm25TopK(docs(s, dir), "doc_id", "text",
          qs, "query_id", "qtext", k = 20)
        val emb = Tables.embeddings(s, dir)
        val vec = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 20, excludeSelf = true, exact = true)
        Retrieval.rrfFuse(Seq(lex, vec), k = 15)
          .orderBy("rank")
      },
      Some(bm25Sql("(CAST(0 AS BIGINT), 'spark window merge stream')", 20) +
        """,
          |lex AS (SELECT id, rank FROM ranked WHERE rank <= 20),
          |e AS (SELECT vec_id AS id,
          |    generate_subscripts(embedding, 1) - 1 AS pos,
          |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
          |  FROM embeddings),
          |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm FROM e GROUP BY 1),
          |dots AS (SELECT c.id, SUM(q.vd * c.vd) AS dotd
          |  FROM e q JOIN e c ON q.pos = c.pos AND q.id = 0 AND c.id <> 0
          |  GROUP BY 1),
          |vec AS (SELECT id, rank FROM (
          |    SELECT dots.id, CAST(ROW_NUMBER() OVER (ORDER BY
          |        CAST(dotd AS DOUBLE) / (nq.nrm * nc.nrm) DESC, dots.id ASC) AS BIGINT) AS rank
          |    FROM dots JOIN norms nq ON nq.id = 0 JOIN norms nc ON nc.id = dots.id)
          |  WHERE rank <= 20),
          |fused AS (SELECT CAST(0 AS BIGINT) AS query_id, COALESCE(l.id, v.id) AS id,
          |    COALESCE(1.0 / (60.0 + l.rank), 0.0) + COALESCE(1.0 / (60.0 + v.rank), 0.0) AS fused
          |  FROM lex l FULL OUTER JOIN vec v ON v.id = l.id)
          |SELECT query_id, rank, id, fused FROM (
          |  SELECT query_id, id, fused, CAST(ROW_NUMBER() OVER (
          |      ORDER BY fused DESC, id ASC) AS BIGINT) AS rank
          |  FROM fused)
          |WHERE rank <= 15 ORDER BY rank""".stripMargin)),

    // SemDeDup semantic dedup, gated end-to-end in its exact configuration:
    // deterministic k-center seeding (centroids = the 4 smallest vec_ids —
    // contiguous from 0 in this fixture, so centroid i IS vec_id i),
    // decimal-exact cosine assignment (argmax with earliest-cell ties),
    // and the earlier-wins ε-neighbor drop rule within each cluster. The
    // oracle re-derives centroid choice, every (vector, centroid) cosine,
    // the argmax, the within-cell pair cosines, and the keep set.
    Q("q153_semdedup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val model = Similarity.seedCentroids(emb, "vec_id", "embedding", k = 4)
        Similarity.semanticDedup(emb, "vec_id", "embedding", model,
            tau = 0.25, exact = true)
          .orderBy("id")
      },
      Some("""WITH e AS (SELECT vec_id AS id,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm FROM e GROUP BY 1),
             |cdots AS (SELECT v.id, c.id AS cell, SUM(v.vd * c.vd) AS dotd
             |  FROM e v JOIN e c ON v.pos = c.pos AND c.id < 4 GROUP BY 1, 2),
             |ccos AS (SELECT cdots.id, cdots.cell,
             |    CAST(dotd AS DOUBLE) / (nv.nrm * nc.nrm) AS cos
             |  FROM cdots JOIN norms nv ON nv.id = cdots.id
             |  JOIN norms nc ON nc.id = cdots.cell),
             |asg AS (SELECT id, CAST(cell AS BIGINT) AS cell FROM (
             |    SELECT id, cell, ROW_NUMBER() OVER (
             |      PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM ccos)
             |  WHERE rn = 1),
             |pairs AS (SELECT a.id AS i, b.id AS j FROM asg a
             |  JOIN asg b ON a.cell = b.cell AND b.id < a.id),
             |pdots AS (SELECT p.i, p.j, SUM(x.vd * y.vd) AS dotd FROM pairs p
             |  JOIN e x ON x.id = p.i JOIN e y ON y.id = p.j AND y.pos = x.pos
             |  GROUP BY 1, 2),
             |dropped AS (SELECT DISTINCT pd.i AS id FROM pdots pd
             |  JOIN norms ni ON ni.id = pd.i JOIN norms nj ON nj.id = pd.j
             |  WHERE CAST(dotd AS DOUBLE) / (ni.nrm * nj.nrm) >= 0.25)
             |SELECT a.id, a.cell, (d.id IS NULL) AS kept
             |FROM asg a LEFT JOIN dropped d ON d.id = a.id
             |ORDER BY a.id""".stripMargin)),

    // Regular-grid resample with forward fill: per-user daily event
    // aggregates, every missing day between a user's first and last
    // observed day emitted with the previous day's values and
    // present=false. The oracle re-derives the bucket grid, the gap
    // generation (lead + range), and the carried-forward values — the
    // whole LOCF contract, not just the observed rows.
    Q("q154_resample_fill",
      (s, dir) => {
        TimeSeries.resampleFill(Tables.events(s, dir), Seq("user_id"), "ts",
            width = DayNs,
            aggs = Seq("n" -> count(lit(1)),
              "sum_value" -> sum(col("value").cast("decimal(18,4)")).cast("double")))
          .orderBy("user_id", "bucket")
      },
      Some("""WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
             |    CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |  FROM events GROUP BY 1, 2),
             |nx AS (SELECT user_id, bucket, n, sum_value,
             |    LEAD(bucket) OVER (PARTITION BY user_id ORDER BY bucket) AS nxt
             |  FROM b),
             |g AS (SELECT user_id, unnest(range(bucket, COALESCE(nxt, bucket + 1))) AS gb,
             |    bucket, n, sum_value FROM nx)
             |SELECT user_id, gb AS bucket, (gb = bucket) AS present, n, sum_value
             |FROM g ORDER BY user_id, bucket""".stripMargin)),

    // Salted general equi-join under q05's oracle VERBATIM: the same
    // lineitem ⋈ orders revenue rollup, but the join runs 8-way salted
    // (left rows deterministically salted, right side replicated per
    // bucket). Green certifies the replication/salting algebra loses and
    // duplicates nothing — the result IS the plain inner join.
    Q("q155_salted_join",
      (s, dir) => {
        val j = Joins.saltedEquiJoin(Tables.lineitem(s, dir), Tables.orders(s, dir),
          Seq("l_orderkey"), Seq("o_orderkey"), salts = 8,
          saltBy = Seq("l_orderkey", "l_linenumber"))
        j.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            SparkEntry.fprod4(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Incremental aggregate maintenance: the per-(day, user) rollup is
    // built by TWO partial upserts (even event_ids, then odd) through
    // IO.upsertAggregate — per-key partials merged with the exact
    // mergeable algebra (long +, decimal + re-cast) into the partitioned
    // table, touched day-directories only. The maintained table must
    // equal the from-scratch rollup exactly — the materialized-view
    // invariant the oracle recomputes.
    Q("q156_ivm_upsert",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val dirP = java.nio.file.Files.createTempDirectory("graft-ivm-")
          .toAbsolutePath.toString + "/rollup"
        graft.sources.IO.upsertAggregate(s, dirP,
          dayAgg(ev.filter(col("event_id") % 2 === 0)),
          Seq("day"), Seq("user_id"), dayMerge)
        graft.sources.IO.upsertAggregate(s, dirP,
          dayAgg(ev.filter(col("event_id") % 2 === 1)),
          Seq("day"), Seq("user_id"), dayMerge)
        readRollup(s, dirP)
      },
      Some(IvmSql)),

    // STREAMING incremental view maintenance under q156's oracle verbatim:
    // the same even/odd split delivered as MemoryStream micro-batches
    // through Streams.aggSink — each batch pre-aggregates to per-key
    // partials and merges into the persisted rollup. Green certifies the
    // batch/stream maintenance paths share one algebra and that the
    // rollup is invariant to how the stream was sliced into batches.
    Q("q157_stream_ivm",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val dirP = java.nio.file.Files.createTempDirectory("graft-sivm-")
          .toAbsolutePath.toString + "/rollup"
        val rows = Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"), col("value"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        val ms = MemoryStream[(Long, Long, Long, Double)](s)
        val stream = ms.toDS().toDF("event_id", "ts", "user_id", "value")
          .withColumn("day", expr(s"ts div ${DayNs}L"))
        val q = graft.streaming.Streams.aggSink(stream, dirP,
            Seq("day"), Seq("user_id"),
            aggExprs = Seq("n" -> count(lit(1)),
              "sum_value" -> sum(col("value").cast("decimal(18,4)"))),
            mergeFns = dayMerge)
          .option("checkpointLocation", dirP + "-ckpt").start()
        try {
          ms.addData(rows.filter(_._1 % 2 == 0).toSeq); q.processAllAvailable()
          ms.addData(rows.filter(_._1 % 2 == 1).toSeq); q.processAllAvailable()
        } finally q.stop()
        readRollup(s, dirP)
      },
      Some(IvmSql)),

    // Persisted BM25 index under q151's oracle VERBATIM (the q123/q125
    // persisted-index gate pattern): the inverted tf table is written
    // ONCE into tb= term-hash buckets + one-row stats, and the query
    // reads only the buckets its terms hash into (isin partition
    // pruning) with zero corpus scans. Green certifies the index build
    // (tokenize/tf/dl/stats at write time), the bucket layout, the
    // pruned read, and the indexed scoring path are bit-identical to
    // the scan-time operator.
    Q("q158_bm25_indexed",
      (s, dir) => {
        import s.implicits._
        val path = Bm25Index.forDir(s, dir)
        val qs = Seq((1L, "spark window merge"),
          (2L, "customer query stream table")).toDF("query_id", "qtext")
        Retrieval.bm25TopKIndexed(path, qs, "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(bm25Sql(
        "(CAST(1 AS BIGINT), 'spark window merge'), " +
          "(CAST(2 AS BIGINT), 'customer query stream table')", 10) +
        "\nSELECT query_id, rank, id, score FROM ranked WHERE rank <= 10" +
        "\nORDER BY query_id, rank")),

    // Trailing 7-day rolling activity per user — the time-RANGE window
    // frame (every row aggregates its key's rows in [ts−7d, ts], both
    // ends inclusive, equal-ts peers in frame). The oracle re-derives
    // the frame semantics at µs granularity (the ns/µs boundary
    // arithmetic is exact: both bounds are ×1000 multiples).
    Q("q159_rolling_window",
      (s, dir) => {
        graft.operators.TimeSeries.rollingAgg(Tables.events(s, dir),
            Seq("user_id"), "ts", lookback = 604800000000000L,
            aggs = Seq(
              "n_7d" -> count(lit(1)),
              "sum_7d" -> sum(col("value").cast("decimal(18,4)"))))
          .select(col("event_id"), col("user_id"), col("n_7d"),
            col("sum_7d").cast("double").as("sum_7d"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_7d
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // Fixed-iteration PageRank over the user→page interaction graph
    // (distinct edges, 3 iterations, d=0.85), exact-reproducible per the
    // Graphs.pageRank contract: per-edge contribution = one double
    // division + decimal(28,15) cast, per-node sums exact, one pinned
    // double expression per iteration. The oracle replays all three
    // iterations — join, out-degree normalization, damping, and the
    // dangling-leak convention are all under the gate.
    Q("q160_pagerank",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val edges = ev.select(
          concat(lit("u"), col("user_id").cast("string")).as("src"),
          concat(lit("p"), pmod(col("event_id"), lit(100L)).cast("string")).as("dst"))
        graft.functions.Graphs.pageRank(edges, "src", "dst", iters = 3)
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
             |    'p' || CAST(event_id % 100 AS VARCHAR) AS dst FROM events),
             |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
             |od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
             |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
             |c1 AS (SELECT e.dst AS node, SUM(CAST(r.rank / od.outdeg AS DECIMAL(28,15))) AS s
             |  FROM e JOIN r0 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
             |r1 AS (SELECT n.node, (1.0 - 0.85) + 0.85 * COALESCE(CAST(c1.s AS DOUBLE), 0.0) AS rank
             |  FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
             |c2 AS (SELECT e.dst AS node, SUM(CAST(r.rank / od.outdeg AS DECIMAL(28,15))) AS s
             |  FROM e JOIN r1 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
             |r2 AS (SELECT n.node, (1.0 - 0.85) + 0.85 * COALESCE(CAST(c2.s AS DOUBLE), 0.0) AS rank
             |  FROM nodes n LEFT JOIN c2 ON c2.node = n.node),
             |c3 AS (SELECT e.dst AS node, SUM(CAST(r.rank / od.outdeg AS DECIMAL(28,15))) AS s
             |  FROM e JOIN r2 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
             |r3 AS (SELECT n.node, (1.0 - 0.85) + 0.85 * COALESCE(CAST(c3.s AS DOUBLE), 0.0) AS rank
             |  FROM nodes n LEFT JOIN c3 ON c3.node = n.node)
             |SELECT node, rank FROM r3 ORDER BY node""".stripMargin)),

    // EXACT per-group median (quantile_disc semantics — an actual group
    // member at lower rank ⌊q·(n−1)⌋+1, no interpolation), next to the
    // KHist approximate quantiles the sketch family serves at scale.
    // Ties in the value order can permute rows, never the selected
    // value — which is what makes the gate exact.
    Q("q161_quantile_exact",
      (s, dir) => {
        graft.operators.Aggregations.quantileDisc(Tables.events(s, dir),
            Seq("user_id"), "value", q = 0.5, outCol = "median_value")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, n, value AS median_value FROM (
             |  SELECT user_id, value,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value ASC) AS rn,
             |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
             |  FROM events)
             |WHERE rn = FLOOR(0.5 * (n - 1)) + 1
             |ORDER BY user_id""".stripMargin))
  )

  /** One persisted BM25 index per fixture dir per JVM (the Batch6
    * IvfIndex pattern): built at first use, every q158 run reads it. */
  private object Bm25Index {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    def forDir(s: SparkSession, dir: String): String =
      cache.getOrElseUpdate(dir, {
        val path = java.nio.file.Files.createTempDirectory("graft-bm25-")
          .toAbsolutePath.toString + "/index"
        Retrieval.writeBm25Index(docs(s, dir), "doc_id", "text", path)
        path
      })
  }
}
