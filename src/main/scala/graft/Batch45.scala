package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 45 (round 15): per-group exact order statistics
  * and the OVERFLOW-regime estimator gate for the streaming SpaceSaving
  * heavy hitters (the r14 agenda's #3 and #4; #6 — a session_window
  * streaming sessionization gate — already exists as q130, see
  * Batch11.scala:196).
  */
private[graft] object Batch45 {

  val queries: Seq[Q] = Seq(

    // Per-group exact percentiles (percentile_cont semantics per
    // l_returnflag) WITHOUT a row sort: the q233 plan with the
    // distinct-value cumulative on per-key PARTITIONED windows (the
    // ksTestBy contract — per-slice cardinality bounds each partition,
    // slices parallelize). Counts, per-group cumulative ranks,
    // bracketing values, and the interpolation are all replayed by the
    // oracle with the same PARTITION BY.
    Q("q267_quantiles_cont_by",
      (s, dir) => graft.operators.Aggregations.quantilesContBy(
        Tables.lineitem(s, dir), Seq("l_returnflag"), "l_extendedprice",
        Seq(0.25, 0.5, 0.9)),
      Some("""WITH c AS (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
             |cum AS (SELECT l_returnflag, v, c,
             |  COALESCE(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER (PARTITION BY l_returnflag) AS n FROM c),
             |p AS (SELECT unnest(CAST([0.25, 0.5, 0.9] AS DOUBLE[])) AS p),
             |lo AS (SELECT cum.l_returnflag, p.p, cum.n, cum.v AS vlo,
             |    p.p * (cum.n - 1) - FLOOR(p.p * (cum.n - 1)) AS frac
             |  FROM cum JOIN p ON cum.s <= CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT)
             |    AND CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) < cum.s + cum.c),
             |hi AS (SELECT cum.l_returnflag AS rf2, p.p AS p2, cum.v AS vhi
             |  FROM cum JOIN p ON cum.s <= LEAST(CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) + 1, cum.n - 1)
             |    AND LEAST(CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) + 1, cum.n - 1) < cum.s + cum.c)
             |SELECT lo.l_returnflag, lo.p, CAST(lo.n AS BIGINT) AS n,
             |  vlo + frac * (vhi - vlo) AS value
             |FROM lo JOIN hi ON lo.l_returnflag = hi.rf2 AND lo.p = hi.p2
             |ORDER BY l_returnflag, p""".stripMargin)),

    // The q262 heavy-hitters gate in the OVERFLOW regime (the q257
    // discipline): capacity 8 ≪ per-day distinct user_ids, so the
    // SpaceSaving summary genuinely evicts and the surfaced keys /
    // counts / errs are insertion-order-DEPENDENT — unhashable by a
    // static oracle. What IS deterministic is the algorithm's
    // invariant: for every surfaced key, true_cnt ≤ cnt ≤ true_cnt +
    // err under ANY insertion/merge order. The query re-derives the
    // exact per-(day, key) counts from the same fixture rows, joins
    // the sink's top-8 against them, and emits one row per day:
    // (n, distinct_keys) exactly replayable from the raw rows, plus
    // `within_bound` = AND over the surfaced keys — which the oracle
    // pins TRUE. If a merge ever breaks the overestimate invariant,
    // the flag flips and the row goes hash-red at the driver.
    Q("q268_hh_overflow_bound",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val rows = Tables.events(s, dir)
          .select(expr("ts div 1000").as("ts_us"),
            col("user_id").cast("string").as("key"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        val dayUs = 86400L * 1000000L
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, String)](s)
        val out = graft.streaming.Streams.windowedHeavyHitters(
          ms.toDS().toDF("ts_us", "key"), watermark = "0 seconds",
          window_ = "1 day", capacity = 8, k = 8)
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q268_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData((flush, "zz")); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(_._1 / dayUs * dayUs).max
        val raw = rows.toSeq.toDF("ts_us", "key")
          .withColumn("bucket_us", expr(s"(ts_us div $dayUs) * $dayUs"))
        val exact = raw.groupBy("bucket_us", "key")
          .agg(count(lit(1)).as("true_cnt"))
        val ok = s.table("q268_sink")
          .filter(col("bucket_us") <= maxBucket)
          .join(exact, Seq("bucket_us", "key"), "left")
          .groupBy("bucket_us")
          .agg(min(col("true_cnt").isNotNull &&
            col("cnt") >= col("true_cnt") &&
            col("cnt") <= col("true_cnt") + col("err")).as("within_bound"))
        raw.groupBy("bucket_us")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("key")).as("distinct_keys"))
          .join(ok, Seq("bucket_us"))
          .select("bucket_us", "n", "distinct_keys", "within_bound")
          .orderBy("bucket_us")
      },
      Some("""WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) * 86400000000 AS bucket_us,
             |    CAST(user_id AS VARCHAR) AS key FROM events)
             |SELECT bucket_us, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(COUNT(DISTINCT key) AS BIGINT) AS distinct_keys,
             |  TRUE AS within_bound
             |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-language 10%-trimmed mean of document lengths — the robust
    // per-slice location estimate a curation pipeline reads daily
    // (outlier pages can't drag a language's length profile). q247's
    // rank machinery with every window PARTITION BY lang; per-group k,
    // kept weights, decimal mass, and the division all replayed.
    Q("q269_trimmed_mean_by",
      (s, dir) => graft.operators.Aggregations.trimmedMeanBy(
          Tables.documents(s, dir), Seq("lang"), "n_chars", alpha = 0.1)
        .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, CAST(n_chars AS DECIMAL(18,2)) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
             |cum AS (SELECT lang, v, c,
             |  COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER (PARTITION BY lang) AS n FROM c),
             |k AS (SELECT lang, CAST(FLOOR(0.1 * CAST(MAX(n) AS DOUBLE)) AS BIGINT) AS k,
             |    CAST(MAX(n) AS BIGINT) AS n FROM cum GROUP BY 1),
             |kept AS (SELECT cum.lang, cum.v,
             |    GREATEST(0, LEAST(cum.s + cum.c, k.n - k.k) - GREATEST(cum.s, k.k)) AS w,
             |    k.n, k.k
             |  FROM cum JOIN k ON cum.lang IS NOT DISTINCT FROM k.lang)
             |SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
             |  CAST(MAX(n) - 2 * MAX(k) AS BIGINT) AS n_kept,
             |  CAST(SUM(CAST(w AS DECIMAL(19,0)) * v) AS DOUBLE)
             |    / CAST(MAX(n) - 2 * MAX(k) AS DOUBLE) AS mean
             |FROM kept WHERE w > 0 GROUP BY lang ORDER BY lang""".stripMargin)),

    // Per-source 10%-winsorized mean of document lengths — q261's
    // clamp-at-the-fences identity per slice: each source's k most
    // extreme rows per tail are clamped to THAT source's fence order
    // statistics (tail mass kept, influence capped). Fences found per
    // group by rank containment; everything decimal until one division.
    Q("q270_winsorized_mean_by",
      (s, dir) => graft.operators.Aggregations.winsorizedMeanBy(
          Tables.documents(s, dir), Seq("source"), "n_chars", alpha = 0.1)
        .orderBy("source"),
      Some("""WITH c AS (SELECT source, CAST(n_chars AS DECIMAL(18,2)) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
             |cum AS (SELECT source, v, c,
             |  COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER (PARTITION BY source) AS n FROM c),
             |k AS (SELECT source, CAST(FLOOR(0.1 * CAST(MAX(n) AS DOUBLE)) AS BIGINT) AS k,
             |    CAST(MAX(n) AS BIGINT) AS n FROM cum GROUP BY 1),
             |fl AS (SELECT cum.source, MIN(cum.v) AS flo
             |  FROM cum JOIN k ON cum.source IS NOT DISTINCT FROM k.source
             |  WHERE cum.s <= k.k AND k.k < cum.s + cum.c GROUP BY 1),
             |fh AS (SELECT cum.source, MIN(cum.v) AS fhi
             |  FROM cum JOIN k ON cum.source IS NOT DISTINCT FROM k.source
             |  WHERE cum.s <= k.n - k.k - 1 AND k.n - k.k - 1 < cum.s + cum.c GROUP BY 1),
             |kept AS (SELECT cum.source, cum.v,
             |    GREATEST(0, LEAST(cum.s + cum.c, k.n - k.k) - GREATEST(cum.s, k.k)) AS w,
             |    k.n, k.k
             |  FROM cum JOIN k ON cum.source IS NOT DISTINCT FROM k.source)
             |SELECT kept.source, CAST(MAX(kept.n) AS BIGINT) AS n,
             |  CAST(MAX(kept.k) AS BIGINT) AS k,
             |  CAST(fl.flo AS DOUBLE) AS fence_lo, CAST(fh.fhi AS DOUBLE) AS fence_hi,
             |  CAST(SUM(CAST(w AS DECIMAL(19,0)) * v)
             |      + CAST(MAX(kept.k) AS DECIMAL(19,0)) * fl.flo
             |      + CAST(MAX(kept.k) AS DECIMAL(19,0)) * fh.fhi AS DOUBLE)
             |    / CAST(MAX(kept.n) AS DOUBLE) AS mean
             |FROM kept
             |JOIN fl ON kept.source IS NOT DISTINCT FROM fl.source
             |JOIN fh ON kept.source IS NOT DISTINCT FROM fh.source
             |WHERE w > 0 GROUP BY kept.source, fl.flo, fh.fhi
             |ORDER BY kept.source""".stripMargin)),

    // Per-language Gini of document lengths — the per-slice
    // concentration screen (one language's corpus collapsing onto a few
    // hot pages hides inside the pooled statistic). q238's rank
    // formulation with the cumulative PARTITION BY lang; per-group
    // decimal mass sums and the pinned division replayed.
    Q("q271_gini_by",
      (s, dir) => graft.operators.Analytics.giniBy(
          Tables.documents(s, dir), Seq("lang"), "n_chars")
        .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, CAST(n_chars AS DECIMAL(18,2)) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
             |cum AS (SELECT lang, v, c,
             |  COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
             |  FROM c),
             |agg AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
             |    SUM(CAST(v AS DECIMAL(20,2)) * CAST(c AS DECIMAL(19,0)) * CAST(2 * b + c + 1 AS DECIMAL(19,0))) AS s1,
             |    SUM(CAST(v AS DECIMAL(20,2)) * CAST(c AS DECIMAL(19,0))) AS sv
             |  FROM cum GROUP BY 1)
             |SELECT lang, n,
             |  CASE WHEN CAST(sv AS DOUBLE) <> 0.0 THEN
             |    (CAST(s1 AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sv AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)) END AS gini
             |FROM agg ORDER BY lang""".stripMargin)),

    // Per-return-flag Spearman ρ between price band and quantity — the
    // Simpson's-paradox screen (a pooled monotone association can be a
    // composition artifact; the sliced form asks each segment). q223's
    // doubled-average-rank model and pinned ρ chain with every window
    // PARTITION BY the key.
    Q("q272_spearman_by",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .withColumn("tp", floor(col("l_extendedprice") / 1000).cast("long"))
          .withColumn("q", col("l_quantity").cast("long"))
        graft.operators.Analytics.spearmanBy(li, Seq("l_returnflag"),
          "tp", "q").orderBy("l_returnflag")
      },
      Some("""WITH j AS (SELECT l_returnflag,
             |    CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS tp,
             |    CAST(l_quantity AS BIGINT) AS q
             |  FROM lineitem),
             |r AS (SELECT l_returnflag,
             |    2 * (RANK() OVER (PARTITION BY l_returnflag ORDER BY tp ASC) - 1)
             |      + COUNT(*) OVER (PARTITION BY l_returnflag, tp) + 1 AS rx,
             |    2 * (RANK() OVER (PARTITION BY l_returnflag ORDER BY q ASC) - 1)
             |      + COUNT(*) OVER (PARTITION BY l_returnflag, q) + 1 AS ry
             |  FROM j),
             |s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(rx AS DECIMAL(38,0))) AS sx,
             |    SUM(CAST(ry AS DECIMAL(38,0))) AS sy,
             |    SUM(CAST(rx * ry AS DECIMAL(38,0))) AS sxy,
             |    SUM(CAST(rx * rx AS DECIMAL(38,0))) AS sxx,
             |    SUM(CAST(ry * ry AS DECIMAL(38,0))) AS syy
             |  FROM r GROUP BY 1)
             |SELECT l_returnflag, n,
             |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             |        AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0 THEN
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |         * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS rho
             |FROM s ORDER BY l_returnflag""".stripMargin)),

    // Per-event-type AUC of q218's weak score/label pair — the sliced
    // filter evaluation (a quality score that ranks well pooled can
    // rank poorly inside one slice). Integer rank sums with
    // average-rank ties, per-slice cumulatives and the division all
    // replayed with PARTITION BY event_type.
    Q("q273_auc_roc_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("score", floor(col("value") / 10).cast("long"))
        graft.functions.ML.aucRocBy(ev, Seq("event_type"), "score",
          col("value") > 55).orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS score,
             |    value > 55 AS lab
             |  FROM events),
             |c AS (SELECT event_type, score,
             |    CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             |    CAST(COUNT(*) AS BIGINT) AS tot
             |  FROM s GROUP BY 1, 2),
             |r AS (SELECT event_type, score, pos, tot,
             |    COALESCE(SUM(tot) OVER (PARTITION BY event_type ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
             |  FROM c),
             |a AS (SELECT event_type, CAST(SUM(pos) AS BIGINT) AS n_pos,
             |    CAST(SUM(tot) - SUM(pos) AS BIGINT) AS n_neg,
             |    SUM(CAST(pos AS DECIMAL(38,0)) * (2 * bef + tot + 1)) AS r2
             |  FROM r GROUP BY 1)
             |SELECT event_type, n_pos, n_neg,
             |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             |    CAST(r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1) AS DOUBLE)
             |      / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END AS auc
             |FROM a ORDER BY event_type""".stripMargin)),

    // Per-event-type PSI between a hash-split reference and a current
    // half whose 'view' slice alone is shifted ×1.5 — the drift a
    // pooled PSI dilutes and the sliced form isolates (the q264
    // argument on the binned gauge). Fixed grid, Laplace smoothing,
    // pinned double terms, exact decimal term sums — all replayed per
    // slice over the (groups × bins) spine.
    Q("q274_psi_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value")))
        graft.operators.Analytics.psiBy(ev, Seq("event_type"), "grp", "v",
          "ref", "cur", lo = 0.0, hi = 400.0, bins = 20)
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    value
             |  FROM events),
             |v AS (SELECT event_type, grp,
             |    CASE WHEN grp = 'cur' AND event_type = 'view' THEN value * 1.5
             |      ELSE value END AS v FROM g),
             |b AS (SELECT event_type, grp,
             |    LEAST(GREATEST(CAST(TRUNC((v - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin
             |  FROM v),
             |c AS (SELECT event_type, bin,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM b GROUP BY 1, 2),
             |spine AS (SELECT et.event_type, s.bin
             |  FROM (SELECT DISTINCT event_type FROM c) et
             |  CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) s),
             |full0 AS (SELECT sp.event_type, sp.bin,
             |    COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
             |  FROM spine sp LEFT JOIN c ON c.event_type = sp.event_type AND c.bin = sp.bin),
             |t AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb FROM full0 GROUP BY 1),
             |terms AS (SELECT f.event_type, t.na, t.nb,
             |    CAST(((CAST(f.ca + 1 AS DOUBLE) / CAST(t.na + 20 AS DOUBLE)
             |         - CAST(f.cb + 1 AS DOUBLE) / CAST(t.nb + 20 AS DOUBLE))
             |      * ln((CAST(f.ca + 1 AS DOUBLE) / CAST(t.na + 20 AS DOUBLE))
             |         / (CAST(f.cb + 1 AS DOUBLE) / CAST(t.nb + 20 AS DOUBLE)))) AS DECIMAL(28,12)) AS term
             |  FROM full0 f JOIN t ON f.event_type = t.event_type)
             |SELECT event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CAST(SUM(term) AS DOUBLE) AS psi
             |FROM terms GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin)),

    // Per-event-type Mann–Whitney U on q274's fixture — the sliced
    // LOCATION test beside the sliced shape test (ksTestBy) and the
    // sliced binned gauge (psiBy): the ×1.5 'view'-only shift shows as
    // a large-|z| slice while the others sit near 0. Doubled rank-sums,
    // tie correction, and the z chain replayed with PARTITION BY.
    Q("q275_mann_whitney_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value")))
        graft.operators.Analytics.mannWhitneyUBy(ev, Seq("event_type"),
          "grp", "v", "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, value
             |  FROM events),
             |vals AS (SELECT event_type, grp,
             |    CASE WHEN grp = 'cur' AND event_type = 'view' THEN value * 1.5
             |      ELSE value END AS v FROM g),
             |c AS (SELECT event_type, v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1, 2),
             |cum AS (SELECT event_type, v, ca, cb, ca + cb AS t,
             |    COALESCE(SUM(ca + cb) OVER (PARTITION BY event_type ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
             |  FROM c),
             |agg AS (SELECT event_type,
             |    CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
             |    SUM(CAST(ca AS DECIMAL(38,0)) * (2 * before + t + 1)) AS r2a,
             |    SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties
             |  FROM cum GROUP BY 1),
             |ua AS (SELECT event_type, n_a, n_b,
             |    (CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0 AS u_a,
             |    CAST(ties AS DOUBLE) AS tiesd,
             |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn
             |  FROM agg)
             |SELECT event_type, n_a, n_b, u_a,
             |  CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) - u_a AS u_b,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND nn > 1 AND
             |      (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * ((nn + 1) - tiesd / (nn * (nn - 1)))) > 0
             |    THEN (u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) /
             |      sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * ((nn + 1) - tiesd / (nn * (nn - 1))))
             |  END AS z
             |FROM ua ORDER BY event_type""".stripMargin)),

    // Per-year Cramér's V between order status and priority — the
    // bounded effect size per slice, comparable ACROSS slices of
    // different sizes (raw χ² is not; association drift over time is
    // the ask). q228's zero-cell-free identity with the key threaded
    // through counts, marginals, totals, and the pinned χ²/V chain.
    Q("q276_cramers_v_by",
      (s, dir) => graft.operators.Analytics.cramersVBy(
          Tables.orders(s, dir)
            .withColumn("yr", year(col("o_orderdate")).cast("long")),
          Seq("yr"), "o_orderstatus", "o_orderpriority")
        .orderBy("yr"),
      Some("""WITH p AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS k,
             |    o_orderstatus AS x, o_orderpriority AS y,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1, 2, 3),
             |mx AS (SELECT k, x, CAST(SUM(c) AS BIGINT) AS cx FROM p GROUP BY 1, 2),
             |my AS (SELECT k, y, CAST(SUM(c) AS BIGINT) AS cy FROM p GROUP BY 1, 2),
             |tot AS (SELECT k, CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(COUNT(DISTINCT x) + MAX(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS rx,
             |    CAST(COUNT(DISTINCT y) + MAX(CASE WHEN y IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ry FROM p GROUP BY 1),
             |s AS (SELECT p.k, SUM(p.c) AS n2, tot.rx, tot.ry,
             |    SUM(CAST(CAST(p.c AS DOUBLE) * CAST(p.c AS DOUBLE) /
             |      (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)) AS DECIMAL(28,12))) AS ssum
             |  FROM p JOIN mx ON p.k = mx.k AND p.x = mx.x
             |    JOIN my ON p.k = my.k AND p.y = my.y
             |    JOIN tot ON p.k = tot.k
             |  GROUP BY p.k, tot.rx, tot.ry)
             |SELECT k AS yr, CAST(n2 AS BIGINT) AS n, rx AS r_x, ry AS r_y,
             |  GREATEST(CAST(n2 AS DOUBLE) * CAST(ssum AS DOUBLE) - CAST(n2 AS DOUBLE), 0.0) AS chi2,
             |  CASE WHEN LEAST(rx, ry) > 1 THEN
             |    sqrt(GREATEST(CAST(n2 AS DOUBLE) * CAST(ssum AS DOUBLE) - CAST(n2 AS DOUBLE), 0.0)
             |      / (CAST(n2 AS DOUBLE) * CAST(LEAST(rx, ry) - 1 AS DOUBLE))) END AS v
             |FROM s ORDER BY yr""".stripMargin)),

    // Per-language Theil's U between source and length bucket — the
    // direction-aware association per slice (which side predicts which,
    // inside each language). q227's pair/marginal/entropy machinery
    // with the key threaded; both entropies and the two U ratios
    // replayed per slice.
    Q("q277_theils_u_by",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("lang"), col("source"),
          floor(col("n_chars") / 100).cast("long").as("lenb"))
        graft.operators.Analytics.theilsUBy(d, Seq("lang"), "source", "lenb")
          .orderBy("lang")
      },
      Some("""WITH t AS (SELECT lang AS k, source AS x,
             |    CAST(FLOOR(n_chars / 100) AS BIGINT) AS y FROM documents),
             |p AS (SELECT k, x, y, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2, 3),
             |mx AS (SELECT k, x, CAST(SUM(c) AS BIGINT) AS cx FROM p GROUP BY 1, 2),
             |my AS (SELECT k, y, CAST(SUM(c) AS BIGINT) AS cy FROM p GROUP BY 1, 2),
             |n AS (SELECT k, CAST(SUM(c) AS BIGINT) AS n FROM p GROUP BY 1),
             |mi AS (SELECT p.k, CAST(SUM(p.c) AS BIGINT) AS nn, CAST(SUM(CAST(
             |    (CAST(p.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(n.n AS DOUBLE) * CAST(p.c AS DOUBLE) / (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)))
             |  AS DECIMAL(28,12))) AS DOUBLE) AS mi
             |  FROM p JOIN mx ON p.k = mx.k AND p.x = mx.x
             |    JOIN my ON p.k = my.k AND p.y = my.y
             |    JOIN n ON p.k = n.k
             |  GROUP BY p.k),
             |hx AS (SELECT mx.k, CAST(-SUM(CAST((CAST(cx AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(cx AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h_x
             |  FROM mx JOIN n ON mx.k = n.k GROUP BY mx.k),
             |hy AS (SELECT my.k, CAST(-SUM(CAST((CAST(cy AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(cy AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h_y
             |  FROM my JOIN n ON my.k = n.k GROUP BY my.k)
             |SELECT mi.k AS lang, nn AS n, mi, h_x, h_y,
             |  CASE WHEN h_x > 0 THEN mi / h_x END AS u_x_given_y,
             |  CASE WHEN h_y > 0 THEN mi / h_y END AS u_y_given_x
             |FROM mi JOIN hx ON mi.k = hx.k JOIN hy ON mi.k = hy.k
             |ORDER BY lang""".stripMargin)),

    // STREAMING per-slice PSI under the full exact oracle — psiBy
    // (q274) as a live gauge, the q232 MemoryStream discipline: daily
    // windows of the 'cur' split scored per event_type against each
    // type's OWN reference histogram (the 'ref' split), with only the
    // 'view' slice shifted ×1.5. Every per-type reference count, each
    // window-slice's mergeable HistAgg bins, the Laplace terms, and the
    // exact decimal sums are ALL replayed — streaming execution must
    // land bit-identical to the batch formula per (window, slice), and
    // the shifted slice's psi must stand out exactly as in q274.
    Q("q278_stream_psi_by",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        import graft.functions.{Sampling, Sketches}
        val g = Tables.events(s, dir)
          .withColumn("grp",
            when(Sampling.hashU32(col("event_id"), "psiby2") < 2147483648L,
              "ref").otherwise("cur"))
        val refCounts = g.filter(col("grp") === "ref")
          .groupBy(col("event_type"))
          .agg(Sketches.histCol(0.0, 400.0, 20)(col("value")).as("h"))
          .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq)
          .toMap
        val cur = g.filter(col("grp") === "cur")
          .select(expr("ts div 1000").as("ts_us"), col("event_type"),
            when(col("event_type") === "view", col("value") * 1.5)
              .otherwise(col("value")).as("value"))
        val rows = cur.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        val dayUs = 86400L * 1000000L
        val flush = ((rows.map(_._1).max / dayUs + 4) * dayUs + 1L,
          "view", 0.0)
        val ms = MemoryStream[(Long, String, Double)](s)
        val out = graft.streaming.Streams.windowedPsiBy(
          ms.toDS().toDF("ts_us", "event_type", "value"), "event_type",
          refCounts, lo = 0.0, hi = 400.0, watermark = "0 seconds",
          window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q278_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData(flush); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q278_sink").filter(col("bucket_us") <= maxBucket)
          .orderBy("bucket_us", "event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby2' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, value, ts
             |  FROM events),
             |refb AS (SELECT event_type,
             |    LEAST(GREATEST(CAST(TRUNC((value - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin
             |  FROM g WHERE grp = 'ref'),
             |spine AS (SELECT et.event_type, s.bin
             |  FROM (SELECT DISTINCT event_type FROM g) et
             |  CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) s),
             |rc AS (SELECT sp.event_type, sp.bin, COALESCE(r.c, 0) AS rc FROM spine sp
             |  LEFT JOIN (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
             |    FROM refb GROUP BY 1, 2) r
             |    ON r.event_type = sp.event_type AND r.bin = sp.bin),
             |nr AS (SELECT event_type, SUM(rc) AS nr FROM rc GROUP BY 1),
             |cur AS (SELECT event_type, (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             |    LEAST(GREATEST(CAST(TRUNC(((CASE WHEN event_type = 'view' THEN value * 1.5 ELSE value END) - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin
             |  FROM g WHERE grp = 'cur'),
             |cb AS (SELECT event_type, bucket_us, bin, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM cur GROUP BY 1, 2, 3),
             |nw AS (SELECT event_type, bucket_us, SUM(c) AS n FROM cb GROUP BY 1, 2),
             |full0 AS (SELECT nw.event_type, nw.bucket_us, nw.n, s.bin, COALESCE(cb.c, 0) AS c
             |  FROM nw JOIN spine s ON s.event_type = nw.event_type
             |  LEFT JOIN cb ON cb.event_type = nw.event_type
             |    AND cb.bucket_us = nw.bucket_us AND cb.bin = s.bin),
             |terms AS (SELECT f.event_type, f.bucket_us, f.n,
             |    CAST(((CAST(f.c + 1 AS DOUBLE) / CAST(f.n + 20 AS DOUBLE)
             |         - CAST(rc.rc + 1 AS DOUBLE) / CAST(nr.nr + 20 AS DOUBLE))
             |      * ln((CAST(f.c + 1 AS DOUBLE) / CAST(f.n + 20 AS DOUBLE))
             |         / (CAST(rc.rc + 1 AS DOUBLE) / CAST(nr.nr + 20 AS DOUBLE)))) AS DECIMAL(28,12)) AS term
             |  FROM full0 f
             |  JOIN rc ON rc.event_type = f.event_type AND rc.bin = f.bin
             |  JOIN nr ON nr.event_type = f.event_type)
             |SELECT CAST(bucket_us AS BIGINT) AS bucket_us, event_type, CAST(n AS BIGINT) AS n,
             |  CAST(SUM(term) AS DOUBLE) AS psi
             |FROM terms GROUP BY 1, 2, 3 ORDER BY bucket_us, event_type""".stripMargin)),

    // Exact average precision (step PR-AUC) of q218's weak score/label
    // pair — the imbalance-honest companion of ROC-AUC: every term is
    // Delta-recall x precision at a distinct-score threshold, suffix
    // TP/FP from exact integer prefixes (no sort), decimal term sum.
    // Counts, prefixes, every term, and the sum replayed.
    Q("q279_avg_precision",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("score", floor(col("value") / 10).cast("long"))
        graft.functions.ML.avgPrecision(ev, "score", col("value") > 55)
      },
      Some("""WITH sc AS (SELECT CAST(FLOOR(value / 10) AS BIGINT) AS score, value > 55 AS lab
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT score,
             |    CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             |    CAST(COUNT(*) AS BIGINT) AS tot
             |  FROM sc GROUP BY 1),
             |cum AS (SELECT score, pos, tot,
             |    COALESCE(SUM(pos) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bp,
             |    COALESCE(SUM(tot) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bt,
             |    SUM(pos) OVER () AS np, SUM(tot) OVER () AS nt
             |  FROM c),
             |t AS (SELECT np, nt,
             |    CAST((CAST(pos AS DOUBLE) / CAST(np AS DOUBLE)) *
             |      (CAST(np - bp AS DOUBLE) / CAST(nt - bt AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM cum)
             |SELECT CAST(MAX(np) AS BIGINT) AS n_pos,
             |  CAST(MAX(nt) - MAX(np) AS BIGINT) AS n_neg,
             |  CASE WHEN MAX(np) > 0 THEN CAST(SUM(term) AS DOUBLE) END AS ap
             |FROM t""".stripMargin)),

    // Per-event-type average precision — the sliced PR-AUC: exactly
    // where class balance differs between slices, the pooled AP is
    // dominated by the majority slice. Keyed prefixes; everything
    // replayed with PARTITION BY.
    Q("q280_avg_precision_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("score", floor(col("value") / 10).cast("long"))
        graft.functions.ML.avgPrecisionBy(ev, Seq("event_type"), "score",
          col("value") > 55).orderBy("event_type")
      },
      Some("""WITH sc AS (SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS score,
             |    value > 55 AS lab FROM events),
             |c AS (SELECT event_type, score,
             |    CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             |    CAST(COUNT(*) AS BIGINT) AS tot
             |  FROM sc GROUP BY 1, 2),
             |cum AS (SELECT event_type, score, pos, tot,
             |    COALESCE(SUM(pos) OVER (PARTITION BY event_type ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bp,
             |    COALESCE(SUM(tot) OVER (PARTITION BY event_type ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bt,
             |    SUM(pos) OVER (PARTITION BY event_type) AS np,
             |    SUM(tot) OVER (PARTITION BY event_type) AS nt
             |  FROM c),
             |t AS (SELECT event_type, np, nt,
             |    CAST((CAST(pos AS DOUBLE) / CAST(np AS DOUBLE)) *
             |      (CAST(np - bp AS DOUBLE) / CAST(nt - bt AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM cum)
             |SELECT event_type, CAST(MAX(np) AS BIGINT) AS n_pos,
             |  CAST(MAX(nt) - MAX(np) AS BIGINT) AS n_neg,
             |  CASE WHEN MAX(np) > 0 THEN CAST(SUM(term) AS DOUBLE) END AS ap
             |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin))
  )
}
