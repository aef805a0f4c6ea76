package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 44 (round 14): the compressed-regime gate for
  * the sketch-ECDF KS — the half of the q225 contract the r12/r13
  * agendas carried ("estimator-gate ksTestSketch's COMPRESSED regime").
  */
private[graft] object Batch44 {

  val queries: Seq[Q] = Seq(

    // Sketch-ECDF KS with compression FORCED (raw continuous purchase
    // values — thousands of distinct doubles — through k = 32
    // centroids), gated by the q43/q128 estimator pattern in its
    // strongest form: the emitted row is the EXACT statistic (ksTest's
    // n_a/n_b/d_at/d — replayed verbatim by the oracle) plus an
    // in-query `within_bound` flag asserting |D̂ − D| ≤ the sketch's own
    // a-priori error bound (2·Σ wmax/n — a compressed centroid can
    // displace an ECDF evaluation by at most its weight). The oracle
    // pins the flag TRUE: if KHist compression ever degrades past its
    // contract, the flag flips and the row goes hash-red at the driver.
    // The bound is sketch-derived, so the gate stays honest under any
    // partitioning (D̂ itself is insertion-order dependent; the bound
    // holds for every order).
    Q("q257_ks_sketch_compressed",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ksc") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value")))
        val exact = graft.operators.Analytics.ksTest(ev, "grp", "v",
          "ref", "cur")
        val sk = graft.operators.Analytics.ksTestSketchBounded(ev, "grp",
            "v", "ref", "cur", k = 32)
          .select(col("d").as("__dsk"), col("err_bound").as("__eb"))
        exact.crossJoin(sk)
          .select(col("n_a"), col("n_b"), col("d_at"), col("d"),
            (abs(col("__dsk") - col("d")) <= col("__eb")).as("within_bound"))
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ksc' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END AS v FROM g),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY v),
             |cum AS (SELECT v,
             |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
             |  FROM c),
             |num AS (SELECT v, na, nb,
             |    ABS(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na) AS num
             |  FROM cum),
             |mx AS (SELECT v, na, nb, num, MAX(num) OVER () AS m FROM num)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  MIN(v) AS d_at,
             |  CAST(MAX(m) AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d,
             |  TRUE AS within_bound
             |FROM mx WHERE num = m GROUP BY na, nb""".stripMargin)),

    // One-pass Pearson correlation matrix over the four lineitem
    // numerics: n + 4 decimal sums + 10 upper-triangle decimal product
    // sums from ONE scan, then every r_ij as the pinned
    // (n·Sij − Si·Sj)/(√·√) double chain — the oracle re-derives the
    // identical 15-statistic aggregate and all 10 pair rows (generated
    // from the same column list, so Spark and SQL can never disagree on
    // pair enumeration or naming).
    Q("q258_corr_matrix",
      (s, dir) => graft.operators.Analytics.corrMatrix(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 2),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val idx = cols.indices
        def d(c: String) = s"CAST($c AS DECIMAL(18,2))"
        val sums = idx.map(i => s"CAST(SUM(${d(cols(i))}) AS DOUBLE) AS s$i")
        val prods = for { i <- idx; j <- idx if j >= i } yield
          s"CAST(SUM(${d(cols(i))} * ${d(cols(j))}) AS DOUBLE) AS p${i}_$j"
        val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
        def vEx(i: Int) = s"(CAST(n AS DOUBLE) * p${i}_$i - s$i * s$i)"
        val pairSelects = for { i <- idx; j <- idx if j >= i } yield
          s"SELECT '${cols(i)}' AS col_x, '${cols(j)}' AS col_y, n, " +
            s"CASE WHEN ${vEx(i)} > 0 AND ${vEx(j)} > 0 THEN " +
            s"(CAST(n AS DOUBLE) * p${i}_$j - s$i * s$j) / " +
            s"(sqrt(${vEx(i)}) * sqrt(${vEx(j)})) END AS corr FROM a"
        s"""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    ${(sums ++ prods).mkString(",\n    ")}
           |  FROM lineitem WHERE $notNull)
           |${pairSelects.mkString("\nUNION ALL\n")}
           |ORDER BY col_x, col_y""".stripMargin
      }),

    // Per-document code-point Shannon entropy (bits) — the native
    // codegen'd compression-proxy quality signal. The oracle re-derives
    // every document's distribution by unnesting character positions,
    // grouping code points, and summing the identical
    // −(c/n)·ln(c/n)/ln 2 terms through the same scale-12 decimal
    // rounding (the psi term contract — the EXACT decimal sum makes
    // per-code-point order irrelevant on both engines).
    Q("q259_char_entropy",
      (s, dir) => Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          graft.functions.Text.charEntropy(col("text")).as("entropy"))
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
             |pos AS (SELECT doc_id, text,
             |    CAST(unnest(range(1, length(text) + 1)) AS INT) AS i FROM d),
             |c AS (SELECT doc_id, unicode(substr(text, i, 1)) AS cp,
             |    CAST(COUNT(*) AS BIGINT) AS c FROM pos GROUP BY 1, 2),
             |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1),
             |t AS (SELECT c.doc_id, n.n,
             |    CAST(-(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
             |      * ln(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
             |      / ln(2.0) AS DECIMAL(28,12)) AS term
             |  FROM c JOIN n ON c.doc_id = n.doc_id)
             |SELECT doc_id, MAX(n) AS n_chars,
             |  CAST(SUM(term) AS DOUBLE) AS entropy
             |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Add-1-smoothed bigram LM self-scoring over the corpus: the oracle
    // re-derives the tokenization (q234's replay), per-doc adjacent
    // pairs via zipped position unnests, the bigram/context counts, the
    // distinct-vocabulary scalar, and every −ln((c+1)/(cc+1·V))
    // surprisal through the same decimal(28,12) accumulation.
    Q("q260_bigram_nll",
      (s, dir) => graft.functions.Text.bigramNll(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH lists AS (SELECT doc_id,
             |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0) AS l FROM documents),
             |toks AS (SELECT doc_id, unnest(l) AS tok,
             |    CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos FROM lists),
             |bg AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
             |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
             |c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cc FROM c12 GROUP BY 1),
             |v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks),
             |scored AS (SELECT bg.doc_id,
             |    CAST(-ln((CAST(c12.c AS DOUBLE) + 1.0)
             |      / (CAST(c1.cc AS DOUBLE) + 1.0 * CAST(v.v AS DOUBLE))) AS DECIMAL(28,12)) AS nll
             |  FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
             |    JOIN c1 ON bg.w1 = c1.w1 CROSS JOIN v)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigram,
             |  CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_nll
             |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // 10%-winsorized mean of line-item prices: the q247 rank machinery
    // plus the two rank-containment fence lookups and the
    // kept-mass + k·(fence_lo + fence_hi) identity — counts, prefix
    // ranks, fences, clamp weights, the exact decimal sum, and the one
    // division all replayed.
    Q("q261_winsorized_mean",
      (s, dir) => graft.operators.Aggregations.winsorizedMean(
        Tables.lineitem(s, dir), "l_extendedprice", alpha = 0.1),
      Some("""WITH c AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |cum AS (SELECT v, c,
             |  COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER () AS n FROM c),
             |k AS (SELECT CAST(FLOOR(0.1 * CAST(MAX(n) AS DOUBLE)) AS BIGINT) AS k, CAST(MAX(n) AS BIGINT) AS n FROM cum),
             |fl AS (SELECT MIN(v) AS flo FROM cum CROSS JOIN k
             |  WHERE cum.s <= k.k AND k.k < cum.s + cum.c),
             |fh AS (SELECT MIN(v) AS fhi FROM cum CROSS JOIN k
             |  WHERE cum.s <= k.n - k.k - 1 AND k.n - k.k - 1 < cum.s + cum.c),
             |kept AS (SELECT cum.v,
             |    GREATEST(0, LEAST(cum.s + cum.c, k.n - k.k) - GREATEST(cum.s, k.k)) AS w,
             |    k.n, k.k
             |  FROM cum CROSS JOIN k)
             |SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
             |  CAST(fl.flo AS DOUBLE) AS fence_lo, CAST(fh.fhi AS DOUBLE) AS fence_hi,
             |  CAST(SUM(CAST(w AS DECIMAL(19,0)) * v)
             |    + CAST(MAX(k) AS DECIMAL(19,0)) * fl.flo
             |    + CAST(MAX(k) AS DECIMAL(19,0)) * fh.fhi AS DOUBLE)
             |    / CAST(MAX(n) AS DOUBLE) AS mean
             |FROM kept CROSS JOIN fl CROSS JOIN fh
             |WHERE w > 0 GROUP BY fl.flo, fh.fhi""".stripMargin)),

    // Streaming windowed heavy hitters driven to completion inside the
    // query (the q232 MemoryStream pattern): per-day top-3 event types
    // from the mergeable SpaceSaving state. Capacity 64 ≫ the distinct
    // type count, so the summary is EXACT (err 0) and the oracle is the
    // full per-window groupBy ranking with the (count desc, key asc)
    // tie-break — the estimator-gate discipline's exact regime.
    Q("q262_stream_heavy_hitters",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val rows = Tables.events(s, dir)
          .select(expr("ts div 1000").as("ts_us"), col("event_type"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        val dayUs = 86400L * 1000000L
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, String)](s)
        val out = graft.streaming.Streams.windowedHeavyHitters(
          ms.toDS().toDF("ts_us", "key"), watermark = "0 seconds",
          window_ = "1 day", capacity = 64, k = 3)
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q262_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData((flush, "zz")); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(_._1 / dayUs * dayUs).max
        s.table("q262_sink").filter(col("bucket_us") <= maxBucket)
          .orderBy("bucket_us", "rank")
      },
      Some("""WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) * 86400000000 AS bucket_us,
             |    event_type AS key FROM events),
             |c AS (SELECT bucket_us, key, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
             |n AS (SELECT bucket_us, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
             |r AS (SELECT bucket_us, key, cnt,
             |    ROW_NUMBER() OVER (PARTITION BY bucket_us ORDER BY cnt DESC, key ASC) AS rank
             |  FROM c)
             |SELECT r.bucket_us, n.n, CAST(r.rank AS BIGINT) AS rank, r.key, r.cnt,
             |  CAST(0 AS BIGINT) AS err
             |FROM r JOIN n ON r.bucket_us = n.bucket_us
             |WHERE r.rank <= 3 ORDER BY r.bucket_us, r.rank""".stripMargin)),

    // Per-group correlation matrices (one per return flag) off ONE
    // scan: q258's 15-statistic aggregate with the group key, every
    // group's 10 pair rows exploded from its aggregated row — oracle
    // generated from the same column list, grouped.
    Q("q263_corr_matrix_by",
      (s, dir) => graft.operators.Analytics.corrMatrixBy(
        Tables.lineitem(s, dir), Seq("l_returnflag"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 2),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val idx = cols.indices
        def d(c: String) = s"CAST($c AS DECIMAL(18,2))"
        val sums = idx.map(i => s"CAST(SUM(${d(cols(i))}) AS DOUBLE) AS s$i")
        val prods = for { i <- idx; j <- idx if j >= i } yield
          s"CAST(SUM(${d(cols(i))} * ${d(cols(j))}) AS DOUBLE) AS p${i}_$j"
        val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
        def vEx(i: Int) = s"(CAST(n AS DOUBLE) * p${i}_$i - s$i * s$i)"
        val pairSelects = for { i <- idx; j <- idx if j >= i } yield
          s"SELECT l_returnflag, '${cols(i)}' AS col_x, '${cols(j)}' AS col_y, n, " +
            s"CASE WHEN ${vEx(i)} > 0 AND ${vEx(j)} > 0 THEN " +
            s"(CAST(n AS DOUBLE) * p${i}_$j - s$i * s$j) / " +
            s"(sqrt(${vEx(i)}) * sqrt(${vEx(j)})) END AS corr FROM a"
        s"""WITH a AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           |    ${(sums ++ prods).mkString(",\n    ")}
           |  FROM lineitem WHERE $notNull GROUP BY l_returnflag)
           |${pairSelects.mkString("\nUNION ALL\n")}
           |ORDER BY l_returnflag, col_x, col_y""".stripMargin
      }),

    // Per-slice KS drift: the cur side is shifted for ONE event type
    // only ('view'), so the pooled statistic dilutes while the per-type
    // slices isolate it — the reason the sliced form exists. Cumulative
    // ECDFs, cross-products, per-slice argmax, and tie-breaks all
    // replayed with PARTITION BY event_type.
    Q("q264_ks_test_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ksb") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 3).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.ksTestBy(ev, Seq("event_type"), "grp",
            "v", "ref", "cur")
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('ksb' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, value
             |  FROM events),
             |vals AS (SELECT event_type, grp,
             |    CAST(FLOOR(CASE WHEN grp = 'cur' AND event_type = 'view'
             |      THEN value * 3 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT event_type, v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1, 2),
             |cum AS (SELECT event_type, v,
             |    SUM(ca) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    SUM(ca) OVER (PARTITION BY event_type) AS na,
             |    SUM(cb) OVER (PARTITION BY event_type) AS nb
             |  FROM c),
             |num AS (SELECT event_type, v, na, nb,
             |    ABS(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na) AS num
             |  FROM cum),
             |mx AS (SELECT event_type, v, na, nb, num,
             |    MAX(num) OVER (PARTITION BY event_type) AS m FROM num)
             |SELECT event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CAST(MIN(v) AS BIGINT) AS d_at,
             |  CASE WHEN na > 0 AND nb > 0 THEN
             |    CAST(MAX(m) AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END AS d
             |FROM mx WHERE num = m GROUP BY event_type, na, nb
             |ORDER BY event_type""".stripMargin)),

    // Partial correlation of price ~ quantity controlling for discount:
    // the q258 sufficient statistics, the three pairwise r chains, and
    // the (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) formula replayed
    // term for term.
    Q("q265_partial_corr",
      (s, dir) => graft.operators.Analytics.partialCorr(
        Tables.lineitem(s, dir), "l_extendedprice", "l_quantity",
        "l_discount", scale = 2),
      Some("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s0,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p00,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS p01,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS p02,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS p11,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS p12,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS p22
             |  FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL AND l_discount IS NOT NULL),
             |r AS (SELECT n,
             |    (CAST(n AS DOUBLE) * p01 - s0 * s1) / (sqrt(CAST(n AS DOUBLE) * p00 - s0 * s0) * sqrt(CAST(n AS DOUBLE) * p11 - s1 * s1)) AS r_xy,
             |    (CAST(n AS DOUBLE) * p02 - s0 * s2) / (sqrt(CAST(n AS DOUBLE) * p00 - s0 * s0) * sqrt(CAST(n AS DOUBLE) * p22 - s2 * s2)) AS r_xz,
             |    (CAST(n AS DOUBLE) * p12 - s1 * s2) / (sqrt(CAST(n AS DOUBLE) * p11 - s1 * s1) * sqrt(CAST(n AS DOUBLE) * p22 - s2 * s2)) AS r_yz
             |  FROM a)
             |SELECT n, r_xy, r_xz, r_yz,
             |  CASE WHEN (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz) > 1e-12 THEN
             |    (r_xy - r_xz * r_yz) / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)) END AS pcorr
             |FROM r""".stripMargin)),

    // Theil's U on the q227 fixture: the same MI/entropy machinery, the
    // two ASYMMETRIC normalizations replayed (which side predicts which
    // — lang over length-bucket vs the reverse).
    Q("q266_theils_u",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("lang"),
          floor(length(col("text")) / 200).cast("long").as("lenb"))
        graft.operators.Analytics.theilsU(d, "lang", "lenb")
      },
      Some("""WITH t AS (SELECT lang AS x, CAST(FLOOR(length(text) / 200) AS BIGINT) AS y FROM documents),
             |p AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY x, y),
             |mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM p GROUP BY x),
             |my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM p GROUP BY y),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM p),
             |mi AS (SELECT SUM(p.c) AS nn, CAST(SUM(CAST(
             |    (CAST(p.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(n.n AS DOUBLE) * CAST(p.c AS DOUBLE) / (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)))
             |  AS DECIMAL(28,12))) AS DOUBLE) AS mi
             |  FROM p JOIN mx ON p.x = mx.x JOIN my ON p.y = my.y CROSS JOIN n),
             |hx AS (SELECT CAST(-SUM(CAST((CAST(cx AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(cx AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h_x
             |  FROM mx CROSS JOIN n),
             |hy AS (SELECT CAST(-SUM(CAST((CAST(cy AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(cy AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h_y
             |  FROM my CROSS JOIN n)
             |SELECT CAST(nn AS BIGINT) AS n, mi, h_x, h_y,
             |  CASE WHEN h_x > 0 THEN mi / h_x END AS u_x_given_y,
             |  CASE WHEN h_y > 0 THEN mi / h_y END AS u_y_given_x
             |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin))
  )
}
