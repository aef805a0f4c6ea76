package graft

import graft.SparkEntry.Q
import graft.functions.Text
import graft.operators.Joins
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Query registry batch 8 (round 6): the remaining text-curation signals a
  * training-data pipeline runs over raw text — Gopher-style repetition
  * statistics, PII detection/redaction, a composite quality gate, and
  * per-document tf·idf keyterms. All per-row signals are narrow codegen'd
  * expressions (no shuffle beyond what the aggregation itself needs), so at
  * 100 TB they ride the scan.
  */
private[graft] object Batch8 {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** DuckDB token-list CTE (the q33/q86 tokenizer, shared shape).
    * Fixture assumption shared by every text oracle since round 1: RE2's
    * `\s` is [\t\n\f\r ] WITHOUT vertical tab (\x0B), which Java regex —
    * and the native normalizer — treats as whitespace; the synthetic
    * corpus contains none. */
  private val toksCte =
    """toks AS (SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
      |    x -> length(x) > 0) AS t
      |  FROM documents)""".stripMargin

  /** DuckDB 2-gram repetition aggregate (grams → per-gram counts → per-doc
    * total/distinct/top), mirroring HashOps.repStatsJava at n=2. */
  private val rep2Ctes =
    s"""$toksCte,
      |grams AS (SELECT doc_id, unnest(list_transform(
      |    range(1, GREATEST(len(t) - 1, 0) + 1), i -> t[i] || ' ' || t[i+1])) AS g
      |  FROM toks),
      |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2),
      |rep AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total,
      |    CAST(COUNT(*) AS BIGINT) AS dist, CAST(MAX(c) AS BIGINT) AS top
      |  FROM cnt GROUP BY 1)""".stripMargin

  val queries: Seq[Q] = Seq(

    // Gopher-style repetition signals: per doc, 2-gram occurrence count,
    // distinct count, the top gram's count, and the derived duplicate /
    // top-gram fractions. Spark side is ONE native expression pass
    // (rep_stats: single tokenizer + count map per row, no materialized
    // gram array); the oracle recomputes via unnest + group by.
    Q("q95_repetition",
      (s, dir) => {
        val st = Text.repetitionStats(col("text"), 2)
        docs(s, dir).select(col("doc_id"),
            st("total").as("n_grams"),
            st("distinct").as("n_distinct"),
            st("top").as("top_count"),
            Text.dupNgramFrac(col("text"), 2).as("dup_frac"),
            Text.topNgramFrac(col("text"), 2).as("top_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $rep2Ctes
             |SELECT d.doc_id,
             |  COALESCE(r.total, 0) AS n_grams,
             |  COALESCE(r.dist, 0) AS n_distinct,
             |  COALESCE(r.top, 0) AS top_count,
             |  CASE WHEN COALESCE(r.total, 0) > 0
             |    THEN CAST(r.total - r.dist AS DOUBLE) / r.total ELSE 0.0 END AS dup_frac,
             |  CASE WHEN COALESCE(r.total, 0) > 0
             |    THEN CAST(r.top AS DOUBLE) / r.total ELSE 0.0 END AS top_frac
             |FROM documents d LEFT JOIN rep r USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // PII detect + redact: emails / phones / IPv4s counted and scrubbed.
    // The corpus text has no PII, so the fixture synthesizes a deterministic
    // tail from doc_id ON BOTH SIDES (same concat in Spark and the oracle) —
    // the operators under test are the count/scrub regexes, whose patterns
    // are restricted to Java-regex ∩ RE2 semantics. Gating md5(redacted)
    // pins every replacement position.
    Q("q96_pii_scrub",
      (s, dir) => {
        val t2 = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com ip 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".0."), pmod(col("doc_id"), lit(100L)).cast("string"),
          lit(" tel +1-555-"), (pmod(col("doc_id"), lit(9000L)) + 1000L).cast("string"),
          when(pmod(col("doc_id"), lit(3L)) === 0,
            lit(" alt bob.smith+x@mail.co")).otherwise(lit("")))
        docs(s, dir).select(col("doc_id"),
            Text.emailCount(t2).as("n_email"),
            Text.phoneCount(t2).as("n_phone"),
            Text.ipCount(t2).as("n_ip"),
            md5(Text.scrubPii(t2)).as("red_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text
             |    || ' contact user' || CAST(doc_id AS VARCHAR)
             |    || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
             |    || '.0.' || CAST(doc_id % 100 AS VARCHAR)
             |    || ' tel +1-555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
             |    || CASE WHEN doc_id % 3 = 0 THEN ' alt bob.smith+x@mail.co' ELSE '' END AS t2
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(t2, '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
             |  CAST(len(regexp_extract_all(t2, '\b\d{1,3}(?:\.\d{1,3}){3}\b')) AS BIGINT) AS n_ip,
             |  md5(regexp_replace(regexp_replace(regexp_replace(t2,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g'),
             |    '\b\d{1,3}(?:\.\d{1,3}){3}\b', '<IP>', 'g')) AS red_md5
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Composite Gopher-style quality gate: token-count window, mean token
    // length window, minimum stopword ratio, maximum duplicate-2-gram
    // fraction. Thresholds chosen to split the fixture corpus (median
    // n_tokens 56, median stop_ratio 0.06, p80 dup_frac 0.05) so BOTH
    // keep outcomes are exercised. Every signal is gated alongside the
    // boolean so a mismatch localizes to the signal, not just the AND.
    Q("q97_gopher_rules",
      (s, dir) => {
        docs(s, dir).select(col("doc_id"),
            Text.tokenCount(col("text")).as("n_tokens"),
            Text.meanTokenLen(col("text")).as("mean_wlen"),
            Text.stopwordRatio(col("text")).as("stop_ratio"),
            Text.dupNgramFrac(col("text"), 2).as("dup2_frac"),
            Text.gopherKeep(col("text"), minTokens = 40, maxTokens = 100000,
              minMeanLen = 3.0, maxMeanLen = 10.0,
              minStopRatio = 0.02, maxDupFrac = 0.05).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $rep2Ctes,
             |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             |    CASE WHEN len(t) > 0 THEN CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) ELSE 0.0 END AS mean_wlen,
             |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('the','a','an','and','of','to','in','is','it'))) AS DOUBLE) / len(t) ELSE 0.0 END AS stop_ratio
             |  FROM toks)
             |SELECT b.doc_id, b.n_tokens, b.mean_wlen, b.stop_ratio,
             |  CASE WHEN COALESCE(r.total, 0) > 0
             |    THEN CAST(r.total - r.dist AS DOUBLE) / r.total ELSE 0.0 END AS dup2_frac,
             |  (b.n_tokens >= 40 AND b.n_tokens <= 100000
             |    AND b.mean_wlen >= 3.0 AND b.mean_wlen <= 10.0
             |    AND b.stop_ratio >= 0.02
             |    AND (CASE WHEN COALESCE(r.total, 0) > 0
             |      THEN CAST(r.total - r.dist AS DOUBLE) / r.total ELSE 0.0 END) <= 0.05) AS keep
             |FROM base b LEFT JOIN rep r USING (doc_id)
             |ORDER BY b.doc_id""".stripMargin)),

    // Per-document tf·idf keyterms (top 3 by tf·N/df, ties → term asc).
    // idf is N/df WITHOUT the log: ranking-equivalent (log is monotone) and
    // exactly two IEEE double ops, so the score — and every rank decision —
    // is bit-identical across engines, where log's last ulp is libm-lottery.
    Q("q98_tfidf",
      (s, dir) => Text.tfidfTopK(docs(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "term"),
      Some(s"""WITH $toksCte,
             |terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
             |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |  FROM terms GROUP BY 1, 2),
             |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
             |SELECT doc_id, term, tf, df, score FROM (
             |  SELECT t.doc_id, t.term, t.tf, d.df,
             |    CAST(t.tf AS DOUBLE) * n.n / d.df AS score,
             |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
             |      ORDER BY CAST(t.tf AS DOUBLE) * n.n / d.df DESC, t.term) AS rn
             |  FROM tf t JOIN dfreq d USING (term), n)
             |WHERE rn <= 3
             |ORDER BY doc_id, term""".stripMargin)),

    // Range (band) join: clicks within ±2 h of each same-user purchase —
    // the interval sibling of q10's asof join, THROUGH Joins.rangeJoin
    // (bucketed equi-join on 2 h windows; the naive formulation is a
    // BroadcastNestedLoopJoin). Times compare at µs granularity on both
    // sides (ts is int64 nanos in Spark; DuckDB truncates the same parquet
    // column to µs — `ts DIV 1000` matches epoch_us exactly for the
    // positive-epoch fixture).
    Q("q99_range_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val us = expr("ts DIV 1000")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), us.as("click_us"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        val twoH = 7200000000L // 2 h in µs
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            (us - twoH).as("lo_us"), (us + twoH).as("hi_us"))
        Joins.rangeJoin(clicks, purchases, Seq("user_id"), "click_us",
            "lo_us", "hi_us", bucketWidth = twoH)
          .select(col("purchase_id"), col("click_id"), col("user_id"),
            col("click_value"))
          .orderBy("purchase_id", "click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             |  p.user_id, c.value AS click_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON c.user_id = p.user_id
             | AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 7200000000
             |                        AND epoch_us(p.ts) + 7200000000
             |ORDER BY purchase_id, click_id""".stripMargin)),

    // Token-window chunking: 32-token chunks with 8 tokens of overlap
    // (stride 24) — the context-window prep for embedding pipelines. The
    // oracle recomputes the chunk grid with the same integer `div`
    // arithmetic (a double division would round differently when cast)
    // and re-slices the token list; gating chunk_text pins the token
    // boundaries, the overlap, and the short tail chunk exactly.
    Q("q100_chunk_tokens",
      (s, dir) => Text.chunkTokens(docs(s, dir), "doc_id", "text",
          chunkSize = 32, overlap = 8)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH $toksCte,
             |meta AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n
             |  FROM toks WHERE len(t) > 0),
             |grid AS (SELECT doc_id, t, n,
             |    unnest(range(0, GREATEST((n - 8 + 23) // 24, 1))) AS chunk_id
             |  FROM meta)
             |SELECT doc_id, chunk_id,
             |  LEAST(chunk_id * 24 + 32, n) - chunk_id * 24 AS n_tokens,
             |  array_to_string(t[chunk_id * 24 + 1 : LEAST(chunk_id * 24 + 32, n)], ' ') AS chunk_text
             |FROM grid
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // partitionplot's DATA (reference src/recipes.jl:1-41): by-grouped
    // IndexedPartition reduce — quantity profiled over 8 fixed
    // extendedprice bins per returnflag, the exact table the reference's
    // plot recipe renders. Closes the last §2 inventory row (rendering
    // itself stays out of scope). Oracle note: DuckDB CAST(double AS INT)
    // ROUNDS where Spark's cast truncates — the SQL uses explicit FLOOR,
    // which agrees with truncate-then-clamp for every input (negatives
    // clamp to bin 0 either way).
    Q("q101_partitionplot",
      (s, dir) => {
        graft.functions.Sketches.partitionplotData(
            Tables.lineitem(s, dir), "l_extendedprice", "l_quantity",
            Seq("l_returnflag"), lo = 0.0, hi = 120000.0, bins = 8)
          .orderBy("l_returnflag", "bin")
      },
      Some("""SELECT l_returnflag,
             |  LEAST(GREATEST(CAST(FLOOR((l_extendedprice - 0.0) / 120000.0 * 8) AS BIGINT), 0), 7) AS bin,
             |  CAST(0.0 AS DOUBLE) + LEAST(GREATEST(CAST(FLOOR((l_extendedprice - 0.0) / 120000.0 * 8) AS BIGINT), 0), 7) * CAST(15000.0 AS DOUBLE) AS x_lo,
             |  CAST(0.0 AS DOUBLE) + (LEAST(GREATEST(CAST(FLOOR((l_extendedprice - 0.0) / 120000.0 * 8) AS BIGINT), 0), 7) + 1) * CAST(15000.0 AS DOUBLE) AS x_hi,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS mean_y,
             |  CAST(MIN(l_quantity) AS DOUBLE) AS min_y,
             |  CAST(MAX(l_quantity) AS DOUBLE) AS max_y
             |FROM lineitem
             |GROUP BY 1, 2
             |ORDER BY l_returnflag, bin""".stripMargin)),

    // Shared-passage detection: maximal runs of ≥3 consecutive shared
    // 3-grams between doc pairs (span-level dedup — boilerplate/quoted
    // passages inside otherwise-distinct docs). The operator joins
    // positioned 64-bit gram HASHES; the oracle joins positioned gram
    // STRINGS and walks the same diagonal/run-group construction — the
    // green row cross-checks the hashed positional index against the
    // exact one (the q86 pattern, plus the run arithmetic). maxDF is OFF
    // here — fixture-only (hottest gram ≤9 docs); at 100 TB boilerplate
    // grams are both the signal and the skew bomb, so a production pass
    // caps them (the cap's semantics are oracle-gated by q104).
    Q("q102_shared_passages",
      (s, dir) => {
        graft.functions.Dedup.sharedPassages(docs(s, dir), "doc_id", "text",
            n = 3, minRun = 3)
          .orderBy("i", "j", "start_i", "start_j")
      },
      Some(s"""WITH $toksCte,
             |idx AS (SELECT doc_id, t, unnest(range(1, GREATEST(len(t) - 2, 0) + 1)) AS i FROM toks),
             |pg AS (SELECT doc_id, i - 1 AS pos, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM idx),
             |m AS (SELECT a.doc_id AS i, b.doc_id AS j, a.pos AS pi, b.pos AS pj, a.pos - b.pos AS d
             |  FROM pg a JOIN pg b ON a.g = b.g AND a.doc_id < b.doc_id),
             |runs AS (SELECT i, j, d, pi, pj,
             |    pi - ROW_NUMBER() OVER (PARTITION BY i, j, d ORDER BY pi) AS grp FROM m),
             |agg AS (SELECT i, j, d, grp, MIN(pi) AS start_i, MIN(pj) AS start_j,
             |    CAST(COUNT(*) AS BIGINT) AS run_grams FROM runs GROUP BY 1, 2, 3, 4)
             |SELECT i, j, start_i, start_j, run_grams, run_grams + 2 AS run_tokens
             |FROM agg WHERE run_grams >= 3
             |ORDER BY i, j, start_i, start_j""".stripMargin)),

    // Span-level dedup TRANSFORM: q102's shared passages REMOVED from all
    // but their first-by-doc-id occurrence (the ExactSubstr removal step).
    // Gating the reconstructed clean_text itself pins the keep-first
    // convention, the token-space range arithmetic, and overlapping-range
    // masking exactly.
    Q("q103_strip_passages",
      (s, dir) => {
        graft.functions.Dedup.stripPassages(docs(s, dir), "doc_id", "text",
            n = 3, minRun = 3)
          .select(col("doc_id"), col("clean_text"), col("n_tokens_clean"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $toksCte,
             |idx AS (SELECT doc_id, t, unnest(range(1, GREATEST(len(t) - 2, 0) + 1)) AS i FROM toks),
             |pg AS (SELECT doc_id, i - 1 AS pos, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM idx),
             |m AS (SELECT a.doc_id AS i, b.doc_id AS j, a.pos AS pi, b.pos AS pj, a.pos - b.pos AS d
             |  FROM pg a JOIN pg b ON a.g = b.g AND a.doc_id < b.doc_id),
             |rns AS (SELECT i, j, d, pi, pj,
             |    pi - ROW_NUMBER() OVER (PARTITION BY i, j, d ORDER BY pi) AS grp FROM m),
             |agg AS (SELECT i, j, d, grp, MIN(pj) AS start_j,
             |    CAST(COUNT(*) AS BIGINT) AS run_grams FROM rns GROUP BY 1, 2, 3, 4),
             |rm AS (SELECT j AS doc_id, list(struct_pack(s := start_j, rt := run_grams + 2)) AS rm
             |  FROM agg WHERE run_grams >= 3 GROUP BY 1)
             |SELECT d.doc_id,
             |  COALESCE(array_to_string(CASE WHEN rm.rm IS NULL THEN d.t
             |    ELSE list_filter(d.t, (x, i) -> len(list_filter(rm.rm,
             |      r -> i - 1 >= r.s AND i - 1 < r.s + r.rt)) = 0) END, ' '), '') AS clean_text,
             |  CAST(CASE WHEN rm.rm IS NULL THEN len(d.t)
             |    ELSE len(list_filter(d.t, (x, i) -> len(list_filter(rm.rm,
             |      r -> i - 1 >= r.s AND i - 1 < r.s + r.rt)) = 0)) END AS BIGINT) AS n_tokens_clean
             |FROM toks d LEFT JOIN rm USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin))
  )
}
