package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 54 (round 15, session 4 cont.): sliced
  * changepoint (pettittTestBy), lexicon term tagging, and top-k
  * rank-biased overlap between two ranking periods.
  */
private[graft] object Batch54 {

  // the Batch53 level-shift instant, reused as the period split
  private val shiftNanos = 1705363200000000000L

  val queries: Seq[Q] = Seq(

    // Sliced Pettitt: the ×1.5 scale shift (q274's convention — the
    // events value is ~exponential with sd ≈ mean, so an additive
    // nudge drowns; a multiplicative one moves P(post > pre) to ~0.6)
    // is injected ONLY into the 'view' slice — its p collapses to
    // ~1e-58 while the unshifted slices sit at 0.6–1.0 (the
    // discriminating-fixture discipline). Both keyed prefixes + the
    // struct-argmax replayed.
    Q("q337_pettitt_by",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_type"), col("ts"),
            (col("value") * when(col("event_type") === "view" &&
              col("ts") >= lit(shiftNanos), 1.5).otherwise(1.0)).as("v"))
        graft.operators.Analytics.pettittTestBy(e, Seq("event_type"),
            "ts", "v")
          .orderBy("event_type")
      },
      Some(s"""WITH x AS (SELECT event_type AS k, CAST(epoch_us(ts) AS BIGINT) * 1000 AS t,
             |    value * CASE WHEN event_type = 'view' AND CAST(epoch_us(ts) AS BIGINT) * 1000 >= $shiftNanos
             |      THEN 1.5 ELSE 1.0 END AS v
             |  FROM events),
             |r AS (SELECT k, t, v,
             |    COUNT(*) OVER (PARTITION BY k ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle,
             |    COUNT(*) OVER (PARTITION BY k, v) AS ceq,
             |    COUNT(*) OVER (PARTITION BY k) AS n
             |  FROM x),
             |s AS (SELECT k, t, n, n + ceq - 2 * cle AS s FROM r),
             |u AS (SELECT k, t, MAX(n) AS n, SUM(s) AS st FROM s GROUP BY k, t),
             |c AS (SELECT k, t, n,
             |    SUM(st) OVER (PARTITION BY k ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u,
             |    MAX(t) OVER (PARTITION BY k) AS tmax
             |  FROM u),
             |cand AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ABS(u) DESC, t ASC) AS rn
             |  FROM c WHERE t < tmax)
             |SELECT k AS event_type, CAST(n AS BIGINT) AS n, t AS t_at,
             |  CAST(u AS DOUBLE) AS u_at, CAST(ABS(u) AS DOUBLE) AS k_stat,
             |  LEAST(1.0, 2.0 * EXP(((-6.0 * CAST(ABS(u) AS DOUBLE)) * CAST(ABS(u) AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) +
             |     CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS p_approx
             |FROM cand WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // Lexicon tagging over the documents corpus: a small curated term
    // list (including a two-word term) broadcast against every doc;
    // counts are the non-overlapping replace identity on BOTH engines.
    Q("q338_lexicon_hits",
      (s, dir) => {
        import s.implicits._
        val lex = Seq("spark", "hash join", "window", "parquet")
          .toDF("term")
        graft.functions.Text.lexiconHits(
            Tables.documents(s, dir), "doc_id", "text", lex)
          .orderBy("doc_id", "term")
      },
      Some("""WITH lex AS (SELECT unnest(['spark', 'hash join', 'window', 'parquet']) AS term),
             |docs AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS txt
             |  FROM documents WHERE text IS NOT NULL)
             |SELECT doc_id, term,
             |  CAST((length(txt) - length(replace(txt, term, ''))) / length(term) AS BIGINT) AS n_occurrences
             |FROM docs JOIN lex ON contains(txt, term)
             |ORDER BY doc_id, term""".stripMargin)),

    // Top-30 heavy-user turnover across the two halves of the events
    // timeline: RBO@30 at p = 0.9 between the per-period activity
    // rankings — the "did the head of the distribution rotate" gauge.
    Q("q339_rbo_topk",
      (s, dir) => {
        val e = Tables.events(s, dir)
        def side(cond: org.apache.spark.sql.Column) =
          e.filter(cond).groupBy(col("user_id"))
            .agg(count(lit(1)).as("cnt"))
        graft.operators.Analytics.rankBiasedOverlap(
          side(col("ts") < lit(shiftNanos)),
          side(col("ts") >= lit(shiftNanos)),
          "user_id", "cnt", k = 30, p = 0.9)
      },
      Some(s"""WITH ca AS (SELECT user_id AS i, CAST(COUNT(*) AS BIGINT) AS s FROM events
             |    WHERE CAST(epoch_us(ts) AS BIGINT) * 1000 < $shiftNanos GROUP BY 1),
             |cb AS (SELECT user_id AS i, CAST(COUNT(*) AS BIGINT) AS s FROM events
             |    WHERE CAST(epoch_us(ts) AS BIGINT) * 1000 >= $shiftNanos GROUP BY 1),
             |ra AS (SELECT i, ROW_NUMBER() OVER (ORDER BY s DESC, i ASC) AS r FROM ca
             |  QUALIFY r <= 30),
             |rb AS (SELECT i, ROW_NUMBER() OVER (ORDER BY s DESC, i ASC) AS r FROM cb
             |  QUALIFY r <= 30),
             |com AS (SELECT GREATEST(ra.r, rb.r) AS m FROM ra JOIN rb ON ra.i = rb.i),
             |spine AS (SELECT d, POWER(0.9, CAST(d AS DOUBLE) - 1) / CAST(d AS DOUBLE) AS w
             |  FROM (SELECT unnest(range(1, 31)) AS d)),
             |rbos AS (SELECT COALESCE(SUM(CAST(w AS DECIMAL(28,12))), CAST(0 AS DECIMAL(28,12))) AS sm
             |  FROM com JOIN spine ON spine.d >= com.m),
             |cts AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ra) AS n_a,
             |    (SELECT CAST(COUNT(*) AS BIGINT) FROM rb) AS n_b,
             |    (SELECT CAST(COUNT(*) AS BIGINT) FROM com) AS n_common)
             |SELECT n_a, n_b, n_common,
             |  CAST(n_common AS DOUBLE) / 30.0 AS agreement_at_k,
             |  0.09999999999999998 * CAST(sm AS DOUBLE) AS rbo
             |FROM cts CROSS JOIN rbos""".stripMargin)),

    // Sliced Mann-Kendall + Theil-Sen over per-type daily series: a
    // 2%/day multiplicative drift injected ONLY into 'view' — its z
    // saturates (every pair concordant) while the other slices stay
    // |z| < 2. Epoch day 19723 = 2024-01-01, the series origin.
    Q("q340_trend_daily_by",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("y0"))
          .select(col("event_type"), col("day"),
            (col("y0") * (lit(1.0) + when(col("event_type") === "view",
              (col("day") - lit(19723L)).cast("double") * 0.02)
              .otherwise(0.0))).as("y"))
        graft.operators.Analytics.mannKendallTrendBy(daily,
            Seq("event_type"), "day", "y")
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type AS k, (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS y0
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT k, CAST(day AS DOUBLE) AS t,
             |    y0 * (1.0 + CASE WHEN k = 'view' THEN CAST(day - 19723 AS DOUBLE) * 0.02 ELSE 0.0 END) AS y
             |  FROM daily),
             |pairs AS (SELECT b1.k AS k, b2.y - b1.y AS dy, b2.t - b1.t AS dt
             |  FROM b b1 JOIN b b2 ON b1.k = b2.k AND b1.t < b2.t),
             |srow AS (SELECT k, CAST(SUM(CAST(SIGN(dy) AS BIGINT)) AS BIGINT) AS s FROM pairs GROUP BY k),
             |ties AS (SELECT k, CAST(SUM(u) AS BIGINT) AS n,
             |    CAST(SUM(u * (u - 1) * (2 * u + 5)) AS BIGINT) AS tt
             |  FROM (SELECT k, CAST(COUNT(*) AS BIGINT) AS u FROM b GROUP BY k, y) GROUP BY k),
             |slope AS (SELECT k, quantile_cont(dy / dt, 0.5) AS sen_slope FROM pairs GROUP BY k),
             |icept AS (SELECT b.k AS k, quantile_cont(b.y - slope.sen_slope * b.t, 0.5) AS intercept
             |  FROM b JOIN slope ON b.k = slope.k GROUP BY b.k),
             |v AS (SELECT ties.k AS k, n, s, tt, sen_slope, intercept,
             |    ((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) * (2.0 * CAST(n AS DOUBLE) + 5) -
             |      CAST(tt AS DOUBLE)) / 18.0 AS var_s
             |  FROM ties JOIN srow USING (k) JOIN slope USING (k) JOIN icept USING (k))
             |SELECT k AS event_type, n, s, var_s,
             |  CASE WHEN var_s > 0 THEN
             |    CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / SQRT(var_s)
             |         WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / SQRT(var_s)
             |         ELSE 0.0 END END AS z,
             |  sen_slope, intercept
             |FROM v ORDER BY event_type""".stripMargin)),

    // Cochran-Armitage: success probability rises with the day index
    // (the deterministic "value inflated 1%/day clears the bar more
    // often" construction), so z lands strongly positive; the five
    // exact sums and the pinned double chain are replayed 1:1. Scores
    // are day - 19723 (0..29) so the variance difference keeps its
    // precision.
    Q("q341_cochran_armitage",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select((expr("ts div 86400000000000") - lit(19723L)).as("d"),
            col("value"))
        graft.operators.Analytics.cochranArmitage(e, "d",
          col("value") * (lit(1.0) + col("d").cast("double") * 0.01) > 50.0)
      },
      Some("""WITH x AS (SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 - 19723 AS s,
             |    CASE WHEN value * (1.0 + CAST((CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 - 19723 AS DOUBLE) * 0.01) > 50.0
             |      THEN 1 ELSE 0 END AS r
             |  FROM events),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COUNT(DISTINCT s) AS BIGINT) AS levels,
             |    CAST(SUM(r) AS BIGINT) AS r,
             |    CAST(SUM(CAST(s AS HUGEINT)) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(s AS HUGEINT) * s) AS DOUBLE) AS s2,
             |    CAST(SUM(CAST(s AS HUGEINT) * r) AS DOUBLE) AS rs
             |  FROM x),
             |b AS (SELECT *, CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS pb,
             |    rs - CAST(r AS DOUBLE) * s1 / CAST(n AS DOUBLE) AS t_stat,
             |    (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) *
             |      (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) *
             |      (s2 - s1 * s1 / CAST(n AS DOUBLE)) AS var_t
             |  FROM a)
             |SELECT n, levels, r, t_stat, var_t,
             |  CASE WHEN var_t > 0 THEN t_stat / SQRT(var_t) END AS z
             |FROM b""".stripMargin)),

    // Novelty curve: per-day active / first-seen / returning user
    // counts over the events timeline — day 0 is all-new, the curve
    // decays as the 150-user population is exhausted.
    Q("q342_novelty_curve",
      (s, dir) => graft.operators.Analytics.noveltyCurve(
          Tables.events(s, dir)
            .select(expr("ts div 86400000000000").as("day"), col("user_id")),
          "day", "user_id")
        .orderBy("day"),
      Some("""WITH x AS (SELECT DISTINCT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS b,
             |    user_id AS k FROM events),
             |f AS (SELECT k, MIN(b) AS fb FROM x GROUP BY k)
             |SELECT b AS day, CAST(COUNT(*) AS BIGINT) AS active,
             |  CAST(SUM(CASE WHEN b = fb THEN 1 ELSE 0 END) AS BIGINT) AS new_keys,
             |  CAST(COUNT(*) - SUM(CASE WHEN b = fb THEN 1 ELSE 0 END) AS BIGINT) AS returning
             |FROM x JOIN f USING (k) GROUP BY b ORDER BY day""".stripMargin)),

    // Streaming EWMA control chart under the FULL exact oracle (the
    // q232 discipline): daily windows of the purchase slice with a ×3
    // level spike injected on epoch day 19748 — its z lands at ~22.9,
    // pinned TRUE. The window means, the (m, v) recursion per prefix
    // (an ordered struct-fold in DuckDB — bit-identical to the stage-2
    // walk's fixed op order), every z, and the threshold flags are ALL
    // replayed; the two-batch MemoryStream drive exercises the
    // cross-micro-batch (m, v) carry.
    Q("q343_stream_ewma",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val cur = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(expr("ts div 1000").as("ts_us"),
            when(expr("ts div 86400000000000") === 19748L,
              col("value") * 3).otherwise(col("value")).as("value"))
        val rows = cur.collect().map(r => (r.getLong(0), r.getDouble(1)))
        val dayUs = 86400L * 1000000L
        val split = 19738L * dayUs
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, Double)](s)
        val out = graft.streaming.Streams.windowedEwmaAnomaly(
          ms.toDS().toDF("ts_us", "value"),
          alpha = 0.25, threshold = 3.0,
          watermark = "0 seconds", window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q343_sink").start()
        try {
          ms.addData(rows.filter(_._1 < split).toSeq); q.processAllAvailable()
          ms.addData(rows.filter(_._1 >= split).toSeq); q.processAllAvailable()
          ms.addData((flush, 0.0)); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q343_sink").filter(col("bucket_us") <= maxBucket)
          .orderBy("bucket_us")
      },
      // the (m, v) recursion replays as a RECURSIVE CTE, one state row
      // per window index — NOT a list_reduce struct-fold, which DuckDB
      // mis-evaluates when the accumulator struct's fields cross-
      // reference inside a chained fold (verified divergence at step 2;
      // the recursive form reproduces the stage-2 walk bit-for-bit)
      Some("""WITH RECURSIVE cur AS (SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             |    CASE WHEN epoch_us(ts) // 86400000000 = 19748 THEN value * 3 ELSE value END AS v
             |  FROM events WHERE event_type = 'purchase'),
             |w AS (SELECT bucket_us, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
             |  FROM cur GROUP BY 1),
             |seq AS (SELECT *, ROW_NUMBER() OVER (ORDER BY bucket_us) AS i FROM w),
             |ew AS (
             |  SELECT CAST(1 AS BIGINT) AS j, mean AS m, CAST(0.0 AS DOUBLE) AS v FROM seq WHERE i = 1
             |  UNION ALL
             |  SELECT s.i AS j,
             |    ew.m + CAST(0.25 AS DOUBLE) * (s.mean - ew.m) AS m,
             |    CAST(0.75 AS DOUBLE) * (ew.v + CAST(0.25 AS DOUBLE) * (s.mean - ew.m) * (s.mean - ew.m)) AS v
             |  FROM ew JOIN seq s ON s.i = ew.j + 1)
             |SELECT s.bucket_us, s.n, s.mean,
             |  CASE WHEN s.i > 1 AND p.v > 0 THEN (s.mean - p.m) / SQRT(p.v) END AS z,
             |  CASE WHEN s.i > 1 AND p.v > 0 THEN ABS((s.mean - p.m) / SQRT(p.v)) > 3.0 END AS is_anomaly
             |FROM seq s LEFT JOIN ew p ON p.j = s.i - 1
             |ORDER BY s.bucket_us""".stripMargin)),

    // Jonckheere-Terpstra across the five ordered WEEKS of the events
    // timeline, with the 2%/day drift injected — the ordered-trend z
    // lands strongly positive where Kruskal-Wallis would only say
    // "groups differ". The wide per-value count row, the multi-weight
    // prefix, exact 2J, and the three-term tie-corrected variance are
    // replayed over a dense (value x group) cell grid.
    Q("q344_jonckheere",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(expr("((ts div 86400000000000) - 19723) div 7").as("wk"),
            (col("value") * (lit(1.0) +
              (expr("ts div 86400000000000") - lit(19723L)).cast("double") *
                0.02)).as("v"))
        graft.operators.Analytics.jonckheereTerpstra(e, "wk", "v",
          Seq(0L, 1L, 2L, 3L, 4L))
      },
      Some("""WITH x AS (SELECT ((CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 - 19723) // 7 AS g,
             |    value * (1.0 + CAST((CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 - 19723 AS DOUBLE) * 0.02) AS v
             |  FROM events),
             |vc AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY 1, 2),
             |vals AS (SELECT DISTINCT v FROM vc),
             |grps AS (SELECT unnest(range(0, 5)) AS g),
             |cell AS (SELECT vals.v, grps.g, COALESCE(vc.c, 0) AS c
             |  FROM vals CROSS JOIN grps LEFT JOIN vc ON vc.v = vals.v AND vc.g = grps.g),
             |cum AS (SELECT v, g, c,
             |    COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl
             |  FROM cell),
             |twoj AS (SELECT SUM(CAST(2 AS HUGEINT) * b.c * a.cl + CAST(a.c AS HUGEINT) * b.c) AS tj
             |  FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g),
             |ties AS (SELECT SUM(CAST(u AS HUGEINT) * (u - 1) * (2 * u + 5)) AS ta,
             |    SUM(CAST(u AS HUGEINT) * (u - 1) * (u - 2)) AS tb,
             |    SUM(CAST(u AS HUGEINT) * (u - 1)) AS tc
             |  FROM (SELECT v, SUM(c) AS u FROM vc GROUP BY v)),
             |gs AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
             |    SUM(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)) AS ga,
             |    SUM(CAST(n AS HUGEINT) * (n - 1) * (n - 2)) AS gb,
             |    SUM(CAST(n AS HUGEINT) * (n - 1)) AS gc,
             |    SUM(CAST(n AS HUGEINT) * n) AS gs2
             |  FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY g)),
             |f AS (SELECT n, CAST(tj AS DOUBLE) / 2.0 AS j_stat,
             |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(gs2 AS DOUBLE)) / 4.0 AS e_j,
             |    CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) AS DOUBLE) AS na,
             |    CAST(ga AS DOUBLE) AS gad, CAST(ta AS DOUBLE) AS tad,
             |    CAST(gb AS DOUBLE) AS gbd, CAST(tb AS DOUBLE) AS tbd,
             |    CAST(gc AS DOUBLE) AS gcd, CAST(tc AS DOUBLE) AS tcd
             |  FROM twoj CROSS JOIN ties CROSS JOIN gs),
             |v2 AS (SELECT n, j_stat, e_j,
             |    CASE WHEN n > 2 THEN (na - gad - tad) / 72.0 +
             |      gbd * tbd / (36.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) * (CAST(n AS DOUBLE) - 2)) +
             |      gcd * tcd / (8.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) END AS var_j
             |  FROM f)
             |SELECT n, CAST(5 AS BIGINT) AS n_groups, j_stat, e_j, var_j,
             |  CASE WHEN var_j > 0 THEN (j_stat - e_j) / SQRT(var_j) END AS z
             |FROM v2""".stripMargin)),

    // Two-sample Anderson-Darling on the q232 drift construction (hash
    // split, cur's every-third value doubled): the tail-weighted gauge
    // beside q217's KS on the same family of fixtures. Every midrank
    // term is a pinned double chain snapped to decimal(28,12); the sum
    // and the (N-1)/N scaling replay exactly.
    Q("q345_ad_test",
      (s, dir) => {
        val g = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psi")
              < 2147483648L, "ref").otherwise("cur"))
          .select(col("grp"),
            when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value")).as("v"))
        graft.operators.Analytics.adTest(g, "grp", "v", "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('psi' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |x AS (SELECT grp, CASE WHEN grp = 'cur' AND event_id % 3 = 0 THEN value * 2 ELSE value END AS v FROM g),
             |vc AS (SELECT v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM x GROUP BY v),
             |cum AS (SELECT v, ca, cb,
             |    COALESCE(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cla,
             |    COALESCE(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS clb,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
             |  FROM vc),
             |c2 AS (SELECT ca, cb, na, nb,
             |    CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) AS nd,
             |    CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE) AS l,
             |    CAST(cla AS DOUBLE) + CAST(clb AS DOUBLE) + l / 2.0 AS b,
             |    b * (nd - b) - nd * l / 4.0 AS den,
             |    CAST(cla AS DOUBLE) + CAST(ca AS DOUBLE) / 2.0 AS ma,
             |    CAST(clb AS DOUBLE) + CAST(cb AS DOUBLE) / 2.0 AS mb,
             |    nd * (CAST(cla AS DOUBLE) + CAST(ca AS DOUBLE) / 2.0) - b * CAST(na AS DOUBLE) AS za,
             |    nd * (CAST(clb AS DOUBLE) + CAST(cb AS DOUBLE) / 2.0) - b * CAST(nb AS DOUBLE) AS zb
             |  FROM cum),
             |t AS (SELECT na, nb,
             |    CASE WHEN ca + cb < na + nb THEN
             |      CAST(l / nd * (za * za) / den / CAST(na AS DOUBLE) +
             |           l / nd * (zb * zb) / den / CAST(nb AS DOUBLE) AS DECIMAL(28,12)) END AS term
             |  FROM c2)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CASE WHEN COUNT(term) = COUNT(*) THEN
             |    (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1.0) /
             |    (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) * CAST(SUM(term) AS DOUBLE) END AS a2
             |FROM t GROUP BY na, nb""".stripMargin)),

    // Sliced Anderson-Darling: the ×1.5 scale shift injected ONLY into
    // the cur half of the 'view' slice — its a2 stands an order of
    // magnitude above the unshifted slices (the discriminating-fixture
    // discipline, tail-weighted edition).
    Q("q347_ad_test_by",
      (s, dir) => {
        val g = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psi")
              < 2147483648L, "ref").otherwise("cur"))
          .select(col("event_type"), col("grp"),
            when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value")).as("v"))
        graft.operators.Analytics.adTestBy(g, Seq("event_type"), "grp",
            "v", "ref", "cur")
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type AS k, CASE WHEN
             |    CAST('0x' || substr(md5('psi' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events),
             |x AS (SELECT k, grp, CASE WHEN grp = 'cur' AND k = 'view' THEN value * 1.5 ELSE value END AS v FROM g),
             |vc AS (SELECT k, v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM x GROUP BY k, v),
             |cum AS (SELECT k, v, ca, cb,
             |    COALESCE(SUM(ca) OVER (PARTITION BY k ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cla,
             |    COALESCE(SUM(cb) OVER (PARTITION BY k ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS clb,
             |    SUM(ca) OVER (PARTITION BY k) AS na, SUM(cb) OVER (PARTITION BY k) AS nb
             |  FROM vc),
             |c2 AS (SELECT k, ca, cb, na, nb,
             |    CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) AS nd,
             |    CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE) AS l,
             |    CAST(cla AS DOUBLE) + CAST(clb AS DOUBLE) + (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / 2.0 AS b,
             |    CAST(cla AS DOUBLE) + CAST(ca AS DOUBLE) / 2.0 AS ma,
             |    CAST(clb AS DOUBLE) + CAST(cb AS DOUBLE) / 2.0 AS mb
             |  FROM cum),
             |c3 AS (SELECT k, ca, cb, na, nb, nd, l, b,
             |    b * (nd - b) - nd * l / 4.0 AS den,
             |    nd * ma - b * CAST(na AS DOUBLE) AS za,
             |    nd * mb - b * CAST(nb AS DOUBLE) AS zb
             |  FROM c2),
             |t AS (SELECT k, na, nb,
             |    CASE WHEN ca + cb < na + nb THEN
             |      CAST(l / nd * (za * za) / den / CAST(na AS DOUBLE) +
             |           l / nd * (zb * zb) / den / CAST(nb AS DOUBLE) AS DECIMAL(28,12)) END AS term
             |  FROM c3)
             |SELECT k AS event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CASE WHEN COUNT(term) = COUNT(*) THEN
             |    (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1.0) /
             |    (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) * CAST(SUM(term) AS DOUBLE) END AS a2
             |FROM t GROUP BY k, na, nb ORDER BY event_type""".stripMargin)),

    // Quantile-forecast eval: a persistence (lag-1) P50 scaled to a
    // deterministic P10/P50/P90 band over the daily-mean series; the
    // per-level pinball sums, coverage shares, and the NULL-forecast
    // first day (n = 29, not 30) replay exactly. The band factors are
    // computed 0.9 + 0.2·q in DOUBLE on both engines (a decimal-typed
    // literal path would land on a different 0.92).
    Q("q346_quantile_forecast",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("actual"))
        val fc = daily.select((col("day") + 1).as("day"),
          col("actual").as("f"))
        graft.operators.TimeSeries.quantileForecastEval(
          daily.join(fc, Seq("day"), "left"), "actual",
          Seq(0.1, 0.5, 0.9).map(q =>
            q -> (col("f") * lit(0.9 + 0.2 * q))))
      },
      Some("""WITH daily AS (SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS actual
             |  FROM events GROUP BY 1),
             |j AS (SELECT d.day, d.actual AS a, f.actual AS f
             |  FROM daily d LEFT JOIN daily f ON f.day = d.day - 1),
             |lev AS (SELECT unnest(CAST([0.1, 0.5, 0.9] AS DOUBLE[])) AS q),
             |t AS (SELECT q, a, f * (0.9 + 0.2 * q) AS fq FROM j CROSS JOIN lev),
             |agg AS (SELECT q, CAST(COUNT(fq) AS BIGINT) AS n,
             |    SUM(CASE WHEN fq IS NOT NULL THEN
             |      CAST(GREATEST(q * (a - fq), (q - 1.0) * (a - fq)) AS DECIMAL(28,12)) END) AS p,
             |    CAST(SUM(CASE WHEN fq IS NOT NULL AND a <= fq THEN 1
             |             WHEN fq IS NOT NULL THEN 0 END) AS BIGINT) AS c
             |  FROM t GROUP BY q)
             |SELECT q, n,
             |  CASE WHEN n > 0 THEN CAST(p AS DOUBLE) / CAST(n AS DOUBLE) END AS pinball,
             |  CASE WHEN n > 0 THEN CAST(c AS DOUBLE) / CAST(n AS DOUBLE) END AS coverage
             |FROM agg ORDER BY q""".stripMargin)),
  )
}
