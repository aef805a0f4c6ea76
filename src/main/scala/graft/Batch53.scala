package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 53 (round 15, session 4): the
  * reference-free changepoint / trend monitoring pair (Pettitt,
  * Mann–Kendall + Theil–Sen), the paired-eval McNemar test, the
  * Good–Turing coverage diagnostic, and graph degree assortativity.
  */
private[graft] object Batch53 {

  // 2024-01-16T00:00:00Z in the events table's int64-nanos timeline —
  // the injected level-shift point for the changepoint fixture
  private val shiftNanos = 1705363200000000000L

  val queries: Seq[Q] = Seq(

    // Pettitt changepoint: a +4.0 level shift injected mid-January into
    // events.value; the rank statistic must localize the split near the
    // injection point with p ~ 0. Both prefixes (value axis, time axis)
    // are the distributed range-exchange machinery; the oracle replays
    // s_i from windowed #le/#eq counts and the time-cumulative U_t.
    Q("q331_pettitt",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("ts"),
            (col("value") + when(col("ts") >= lit(shiftNanos), 4.0)
              .otherwise(0.0)).as("v"))
        graft.operators.Analytics.pettittTest(e, "ts", "v")
      },
      Some(s"""WITH x AS (SELECT CAST(epoch_us(ts) AS BIGINT) * 1000 AS t,
             |    value + CASE WHEN CAST(epoch_us(ts) AS BIGINT) * 1000 >= $shiftNanos
             |      THEN 4.0 ELSE 0.0 END AS v
             |  FROM events),
             |r AS (SELECT t, v,
             |    COUNT(*) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle,
             |    COUNT(*) OVER (PARTITION BY v) AS ceq,
             |    COUNT(*) OVER () AS n
             |  FROM x),
             |s AS (SELECT t, n, n + ceq - 2 * cle AS s FROM r),
             |u AS (SELECT t, MAX(n) AS n, SUM(s) AS st FROM s GROUP BY t),
             |c AS (SELECT t, n,
             |    SUM(st) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u,
             |    MAX(t) OVER () AS tmax
             |  FROM u)
             |SELECT CAST(n AS BIGINT) AS n, t AS t_at, CAST(u AS DOUBLE) AS u_at,
             |  CAST(ABS(u) AS DOUBLE) AS k_stat,
             |  LEAST(1.0, 2.0 * EXP(((-6.0 * CAST(ABS(u) AS DOUBLE)) * CAST(ABS(u) AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) +
             |     CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS p_approx
             |FROM c WHERE t < tmax
             |ORDER BY ABS(u) DESC, t ASC LIMIT 1""".stripMargin)),

    // Mann–Kendall + Theil–Sen over the daily mean-value series (30
    // points at sf0.01 — the bounded-series contract): S and the tie
    // term are exact longs over the distributed pair join, both medians
    // ride the quantilesCont distributed prefix, and the oracle replays
    // the pair join plus quantile_cont (author-verified equal to the
    // q233 interpolation chain).
    Q("q332_trend_daily",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("y"))
        graft.operators.Analytics.mannKendallTrend(daily, "day", "y")
      },
      Some("""WITH daily AS (SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |b AS (SELECT CAST(day AS DOUBLE) AS t, y FROM daily),
             |pairs AS (SELECT b2.y - b1.y AS dy, b2.t - b1.t AS dt
             |  FROM b b1 JOIN b b2 ON b1.t < b2.t),
             |srow AS (SELECT CAST(SUM(CAST(SIGN(dy) AS BIGINT)) AS BIGINT) AS s FROM pairs),
             |ties AS (SELECT CAST(SUM(u) AS BIGINT) AS n,
             |    CAST(SUM(u * (u - 1) * (2 * u + 5)) AS BIGINT) AS tt
             |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS u FROM b GROUP BY y)),
             |slope AS (SELECT quantile_cont(dy / dt, 0.5) AS sen_slope FROM pairs),
             |icept AS (SELECT quantile_cont(b.y - slope.sen_slope * b.t, 0.5) AS intercept
             |  FROM b CROSS JOIN slope),
             |v AS (SELECT *,
             |    ((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) * (2.0 * CAST(n AS DOUBLE) + 5) -
             |      CAST(tt AS DOUBLE)) / 18.0 AS var_s
             |  FROM srow CROSS JOIN ties CROSS JOIN slope CROSS JOIN icept)
             |SELECT n, s, var_s,
             |  CASE WHEN var_s > 0 THEN
             |    CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / SQRT(var_s)
             |         WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / SQRT(var_s)
             |         ELSE 0.0 END END AS z,
             |  sen_slope, intercept
             |FROM v""".stripMargin)),

    // McNemar on two deterministic "filters" scored against the same
    // deterministic label over every event: only the discordant counts
    // carry the comparison. One conditional aggregate; the oracle
    // replays the 2x2 discordant cells and the continuity-corrected
    // chain.
    Q("q333_mcnemar",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val y = col("event_id") % 7 === 0
        graft.operators.Analytics.mcNemar(e,
          (col("value") > 10.0) === y, (col("user_id") % 2 === 0) === y)
      },
      Some("""WITH m AS (SELECT
             |    (value > 10.0) = (event_id % 7 = 0) AS a_ok,
             |    (user_id % 2 = 0) = (event_id % 7 = 0) AS b_ok
             |  FROM events),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(SUM(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS c
             |  FROM m)
             |SELECT n, b, c,
             |  CASE WHEN b + c > 0 THEN
             |    (GREATEST(ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0, 0.0) *
             |     GREATEST(ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0, 0.0)) /
             |    (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END AS chi2_cc,
             |  CASE WHEN b + c > 0 THEN
             |    (CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) /
             |    SQRT(CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END AS z
             |FROM agg""".stripMargin)),

    // Sliced McNemar: the same paired comparison per event_type — the
    // "does B beat A on every slice" report.
    Q("q334_mcnemar_by",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val y = col("event_id") % 7 === 0
        graft.operators.Analytics.mcNemarBy(e, Seq("event_type"),
            (col("value") > 10.0) === y, (col("user_id") % 2 === 0) === y)
          .orderBy("event_type")
      },
      Some("""WITH m AS (SELECT event_type,
             |    (value > 10.0) = (event_id % 7 = 0) AS a_ok,
             |    (user_id % 2 = 0) = (event_id % 7 = 0) AS b_ok
             |  FROM events),
             |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(SUM(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS c
             |  FROM m GROUP BY 1)
             |SELECT event_type, n, b, c,
             |  CASE WHEN b + c > 0 THEN
             |    (GREATEST(ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0, 0.0) *
             |     GREATEST(ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0, 0.0)) /
             |    (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END AS chi2_cc,
             |  CASE WHEN b + c > 0 THEN
             |    (CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) /
             |    SQRT(CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END AS z
             |FROM agg ORDER BY event_type""".stripMargin)),

    // Good–Turing unseen mass over the documents corpus at TRIGRAM
    // order — the synthetic 31-word vocabulary saturates at unigram
    // order (N1 = 0, a degenerate spectrum), so the gate runs the
    // n-gram form where once-seen types genuinely exist; q231's
    // tokenizer contract, the q93 gram construction, three conditional
    // sums, one row out.
    Q("q335_good_turing",
      (s, dir) => graft.functions.Text.goodTuringMass(
        Tables.documents(s, dir), "text", n = 3),
      Some("""WITH lists AS (SELECT list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0) AS t FROM documents),
             |toks AS (SELECT unnest(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
             |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok FROM lists),
             |tf AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
             |agg AS (SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) AS n_tokens,
             |    CAST(COUNT(*) AS BIGINT) AS vocab,
             |    COALESCE(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n1,
             |    COALESCE(CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n2
             |  FROM tf)
             |SELECT n_tokens, vocab, n1, n2,
             |  CASE WHEN n_tokens > 0 THEN CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS p_unseen,
             |  CASE WHEN n_tokens > 0 THEN 1.0 - CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS coverage,
             |  CASE WHEN n1 > 0 THEN (2.0 * CAST(n2 AS DOUBLE)) / CAST(n1 AS DOUBLE) END AS r1_star,
             |  CASE WHEN n2 > 0 THEN CAST(vocab AS DOUBLE) + CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE)) END AS chao1
             |FROM agg""".stripMargin)),

    // Degree assortativity of the part co-order graph (q176's edge
    // set): exact HUGEINT/decimal sums, pinned double Pearson chain.
    Q("q336_assortativity",
      (s, dir) => {
        val e = Tables.coPurchaseEdges(s, dir)
        graft.functions.Graphs.degreeAssortativity(e)
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |und AS (SELECT i, j FROM e UNION ALL SELECT j AS i, i AS j FROM e),
             |deg AS (SELECT i AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
             |st AS (SELECT di.d AS dx, dj.d AS dy FROM und
             |  JOIN deg di ON und.i = di.node
             |  JOIN deg dj ON und.j = dj.node),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             |    CAST(SUM(dx) AS DOUBLE) AS sx, CAST(SUM(dy) AS DOUBLE) AS sy,
             |    CAST(SUM(dx * dy) AS DOUBLE) AS sxy,
             |    CAST(SUM(dx * dx) AS DOUBLE) AS sxx,
             |    CAST(SUM(dy * dy) AS DOUBLE) AS syy
             |  FROM st),
             |v AS (SELECT m,
             |    sxy * CAST(m AS DOUBLE) - sx * sy AS cov,
             |    sxx * CAST(m AS DOUBLE) - sx * sx AS vx,
             |    syy * CAST(m AS DOUBLE) - sy * sy AS vy
             |  FROM a)
             |SELECT m AS m_stubs,
             |  CASE WHEN vx > 0 AND vy > 0 THEN cov / SQRT(vx * vy) END AS r
             |FROM v""".stripMargin)),
  )
}
