package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators over keyed event streams: ordered-funnel
  * conversion and cohort retention — the classic product-analytics
  * queries a time-indexed table serves (reference: time-dimension
  * `loadndsparse` tables + groupby, docs/src/tutorial.md; these are the
  * canonical compositions users run on them).
  */
object Analytics {

  /** Ordered funnel: for each key, the earliest strictly-ordered
    * completion of `steps` — t₁ = min ts of step 1, tᵢ₊₁ = min ts of
    * step i+1 AFTER tᵢ (strict: a simultaneous event does not advance
    * the funnel) — and whether the whole chain completed within
    * `within` time units of t₁ (`converted`). This greedy
    * earliest-event semantics is the standard funnel definition (it
    * maximizes completion: if any assignment completes the funnel, the
    * greedy one does).
    *
    * Output: one row per key that completed step 1 — (key,
    * n_steps, t_first, t_last, converted); keys that never fired step 1
    * are absent (count them upstream if needed).
    *
    * Scale shape: one pass per step, each filtered to THAT step's type
    * BEFORE its aggregate (events of other types never reach step i's
    * exchange), all keyed on the funnel key — with AQE the small
    * per-key prior-step frame broadcasts into each join. `steps` is
    * small by definition (funnels are 2–5 steps), so the k-pass plan is
    * k filtered aggregates, not k corpus joins. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String], within: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(within > 0, s"within must be positive, got $within")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("t1"))
    val withTs = steps.tail.zipWithIndex.foldLeft(first) {
      case (prev, (step, i)) =>
        val prevT = s"t${i + 1}"
        val thisT = s"t${i + 2}"
        val stepMin = events.filter(col(typeCol) === step)
          .join(prev.select(col(keyCol), col(prevT)), Seq(keyCol))
          .filter(col(tsCol) > col(prevT))
          .groupBy(col(keyCol))
          .agg(min(col(tsCol)).as(thisT))
        prev.join(stepMin, Seq(keyCol), "left")
    }
    val tCols = steps.indices.map(i => col(s"t${i + 1}"))
    // n_steps = deepest non-null prefix (later t's are null-chained by
    // construction: tᵢ₊₁ only exists when tᵢ does)
    val nSteps = tCols.map(t => when(t.isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    val tLast = coalesce(tCols.reverse: _*)
    withTs.select(
      col(keyCol),
      nSteps.as("n_steps"),
      col("t1").as("t_first"),
      tLast.as("t_last"),
      (tCols.last.isNotNull && tCols.last - col("t1") <= within).as("converted"))
  }

  /** Cohort retention: users are cohorted by their FIRST active bucket
    * (`bucket = ts div width`), and the output counts, for every
    * (cohort, offset) with offset ≥ 0, the distinct users of that
    * cohort active `offset` buckets after their first — the retention
    * triangle. Two map-side-combined aggregates (user×bucket distinct,
    * then per-user min) + one broadcast-friendly join back; the events
    * table is never shuffled at full width. */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
                      width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val active = events
      .select(col(keyCol), expr(s"$tsCol div ${width}L").as("bucket"))
      .distinct()
    val cohorts = active.groupBy(col(keyCol)).agg(min(col("bucket")).as("cohort"))
    active.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-group z-score outlier detection: rows with
    * `|x − mean| > k·std` (population std), annotated with the group
    * `mean`/`std` and the row's `z`. The moments accumulate EXACTLY in
    * decimal (order-independent), the flag arithmetic is then plain
    * double with a pinned order (`std = sqrt((Σx² − Σx·Σx/n)/n)`) — the
    * same ops in any engine, so every emitted row AND the threshold
    * decision itself are oracle-replayable. A zero-variance group emits
    * nothing (`|x−mean| > 0` is false), and `z` is only computed on
    * emitted rows, so no division by zero exists.
    *
    * 100 TB: one map-side-combined moment aggregate (per-group result =
    * 3 numbers, broadcast back) + one scan with a per-row filter — the
    * corpus is never shuffled, no window anywhere. The practical use in
    * a curation pipeline: flag length/score anomalies per (source,
    * lang) slice without a quantile pass. */
  /** Robust (median/MAD) outlier detection — [[outliersZ]]'s companion
    * for heavy-tailed data, where the mean/std themselves are dragged by
    * the outliers they're meant to find: flag rows with
    * `|x − median| > k·MAD` (MAD = median absolute deviation), annotated
    * with `med`, `mad`, and the robust score `z_mad = |x−med|/mad`.
    * Built on [[Aggregations.quantileDisc]]'s lower-rank selection, so
    * every statistic is an actual member value and the only arithmetic
    * is subtract/abs/multiply/compare on doubles — fully
    * oracle-replayable, no variance formula at all.
    *
    * Cost shape: TWO per-key window sorts (the median passes) + two
    * broadcast joins of the tiny per-key stat frames — the price of
    * robustness over outliersZ's single moment aggregate; the
    * hot-key window caveat is Sessions'/quantileDisc's, documented
    * there. Zero-MAD groups (>50% identical values) emit nothing, same
    * contract as outliersZ's zero-variance case. */
  def outliersMad(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  k: Double): DataFrame = {
    require(k >= 0, s"k must be non-negative, got $k")
    val med = Aggregations.quantileDisc(df, keyCols, valueCol, 0.5, "med")
      .drop("n")
    val withDev = df.join(broadcast(med), keyCols)
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = Aggregations.quantileDisc(
        withDev.select((keyCols.map(col) :+ col("__dev")): _*),
        keyCols, "__dev", 0.5, "mad")
      .drop("n")
    withDev.join(broadcast(mad), keyCols)
      .filter(col("__dev") > lit(k) * col("mad"))
      .withColumn("z_mad", col("__dev") / col("mad"))
      .drop("__dev")
  }

  /** First-order (Markov) transition counts over a keyed event sequence:
    * for every key's events ordered by (`tsCol`, `tieCols`), each
    * consecutive (state, next state) pair is counted corpus-wide, with
    * `p = n / n_from` (the row-conditional transition probability, one
    * pinned division). The training-data use: behavioral-sequence
    * features and next-event models start from exactly this table.
    *
    * ONE window exchange (the per-key sort — lead rides it) + one
    * map-side-combined count keyed on the (from, to) pair (state-pair
    * cardinality, not event cardinality) + a broadcast-sized per-from
    * aggregate joined back. Events never shuffle twice. */
  def transitions(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  stateCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).asc +: tieCols.map(col(_).asc)): _*)
    val pairs = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(col(stateCol).as("from_state"), col("__next").as("to_state"))
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val fromTotals = counts.groupBy("from_state")
      .agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(fromTotals), Seq("from_state"))
      .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
  }

  /** Per-group Gini impurity of a categorical column —
    * `1 − Σ_v (n_v/n)²` — the libm-free diversity measure (entropy needs
    * log; Gini is exact integer counts + ONE division, so the oracle
    * replays it bit-for-bit). Curation use: source/language diversity of
    * a corpus slice, mixture monitoring.
    *
    * Two map-side-combined aggregates ((key, value) counts, then per-key
    * Σn_v and Σn_v²) — no window, value-cardinality bounded. n_v² sums
    * accumulate in decimal(38,0): at 100 TB a hot value's count² passes
    * 2^63 long overflow. */
  def giniImpurity(df: DataFrame, keyCols: Seq[String],
                   valueCol: String): DataFrame = {
    val counts = df.groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__nv"))
    counts.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__nv")).as("n"),
        sum((col("__nv") * col("__nv")).cast("decimal(38,0)")).as("__ss"))
      .withColumn("gini",
        lit(1.0) - col("__ss").cast("double") /
          (col("n").cast("double") * col("n").cast("double")))
      .drop("__ss")
  }

  /** Pearson chi-square drift statistic between a reference snapshot and
    * a current snapshot of a categorical column — the standard
    * distribution-drift monitor for training-data pipelines (PSI needs
    * log; chi² is exact counts + pinned ratios, so it hash-gates).
    *
    * For each category c present in `ref`:
    *   exp_c  = n_cur_total · n_ref_c / n_ref_total   (pinned doubles)
    *   term_c = (n_cur_c − exp_c)² / exp_c
    * and chi2 = Σ term_c, accumulated via an exact decimal(28,12) cast
    * of the per-category double terms (order-independent — the module's
    * dsum discipline). Categories present ONLY in `cur` have exp = 0
    * (the statistic is undefined there); they are returned with
    * null expected/term and EXCLUDED from chi2 — `n_unseen` counts them
    * so a caller alerting on drift can alert on novel categories too.
    *
    * Output: one row per category — (cat, n_ref, n_cur, expected, term)
    * — plus the constant columns (chi2, dof, n_unseen) for the verdict.
    * Scale shape: two map-side-combined count aggregates (category
    * cardinality rows each) + a full outer join and windows over the
    * tiny category frame. The corpus is scanned once per side; nothing
    * corpus-sized shuffles. */
  def chiSquareDrift(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    val r = ref.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, Seq("cat"), "full_outer")
      .select(col("cat"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    val withTotals = joined
      .withColumn("__ref_tot", sum(col("n_ref")).over(w))
      .withColumn("__cur_tot", sum(col("n_cur")).over(w))
      .withColumn("expected",
        when(col("n_ref") > 0,
          col("__cur_tot").cast("double") * col("n_ref").cast("double") /
            col("__ref_tot").cast("double")))
      .withColumn("term",
        when(col("n_ref") > 0,
          (col("n_cur").cast("double") - col("expected")) *
            (col("n_cur").cast("double") - col("expected")) / col("expected")))
    withTotals
      .withColumn("chi2",
        sum(col("term").cast("decimal(28,12)")).over(w).cast("double"))
      .withColumn("dof",
        sum(when(col("n_ref") > 0, 1L).otherwise(0L)).over(w) - lit(1L))
      .withColumn("n_unseen",
        sum(when(col("n_ref") === 0, 1L).otherwise(0L)).over(w))
      .drop("__ref_tot", "__cur_tot")
  }

  /** 2-D equal-width histogram — the density-heatmap reduction (EDA over
    * a joint distribution at any scale): both bins are per-row floor
    * expressions with edge clamping into [0, bins), the count is ONE
    * map-side-combined aggregate — the whole heatmap costs a scan and
    * ships bins_x·bins_y partial rows per task. Empty cells are absent
    * (sparse output; densify downstream if a full grid is needed). */
  def histogram2d(df: DataFrame, xCol: String, yCol: String,
                  xLo: Double, xHi: Double, binsX: Int,
                  yLo: Double, yHi: Double, binsY: Int): DataFrame = {
    require(binsX >= 1 && binsY >= 1 && xHi > xLo && yHi > yLo,
      "need positive bin counts and hi > lo on both axes")
    def bin(c: String, lo: Double, hi: Double, n: Int) =
      least(greatest(floor((col(c) - lo) / ((hi - lo) / n)).cast("long"),
        lit(0L)), lit(n.toLong - 1))
    df.groupBy(bin(xCol, xLo, xHi, binsX).as("bx"),
        bin(yCol, yLo, yHi, binsY).as("by"))
      .agg(count(lit(1)).as("n"))
  }

  /** Spearman rank correlation of two columns — the monotone-association
    * complement of olsFit's Pearson r, exact up to the final formula:
    * average ranks for ties are kept as INTEGER doubled-ranks
    * r2 = 2·(rank−1) + tied + 1 (the ×2 cancels in ρ), the five
    * sufficient statistics accumulate in decimal(38,0), and
    * ρ = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²)) is a
    * pinned double chain (IEEE sqrt). Two full-table ranking windows —
    * the single-task-window contract shared with ksTest/aucRoc
    * (documented; rank-sketches are the unbounded path). NULL for
    * degenerate (constant) columns. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def r2(c: String) = {
      val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col(c).asc)
      val wVal = org.apache.spark.sql.expressions.Window.partitionBy(col(c))
      (lit(2) * (rank().over(wOrd) - 1) + count(lit(1)).over(wVal) + 1)
        .cast("long")
    }
    df.select(col(xCol), col(yCol))
      .withColumn("__rx", r2(xCol))
      .withColumn("__ry", r2(yCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__rx").cast("decimal(38,0)")).as("__sx"),
        sum(col("__ry").cast("decimal(38,0)")).as("__sy"),
        sum((col("__rx") * col("__ry")).cast("decimal(38,0)")).as("__sxy"),
        sum((col("__rx") * col("__rx")).cast("decimal(38,0)")).as("__sxx"),
        sum((col("__ry") * col("__ry")).cast("decimal(38,0)")).as("__syy"))
      .withColumn("__vx",
        col("n").cast("double") * col("__sxx").cast("double") -
          col("__sx").cast("double") * col("__sx").cast("double"))
      .withColumn("__vy",
        col("n").cast("double") * col("__syy").cast("double") -
          col("__sy").cast("double") * col("__sy").cast("double"))
      .withColumn("rho",
        when(col("__vx") > 0 && col("__vy") > 0,
          (col("n").cast("double") * col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double")) /
            (sqrt(col("__vx")) * sqrt(col("__vy")))))
      .select("n", "rho")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between groups `a` and `b`
    * of `valueCol` — the distribution-drift test for CONTINUOUS columns
    * (chiSquareDrift's categorical complement), computed EXACTLY:
    * D = max_x |F_a(x) − F_b(x)| evaluated on the pooled distinct
    * values via the integer cross-product form
    * |cum_a·n_b − cum_b·n_a| (decimal(38,0) — no rounding enters the
    * argmax), then ONE division for D. `d_at` reports the smallest
    * value attaining the max (deterministic tie-break). Plan: one
    * (value)-grouped count aggregate, then ONE single-task window over
    * the DISTINCT values — bounded by value cardinality, not rows (at
    * unbounded cardinality the KHist-sketch ECDF is the scale path;
    * this is the exact form). */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
             groupA: String, groupB: String): DataFrame = {
    val counts = df.filter(col(groupCol).isin(groupA, groupB))
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("__cb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v").asc)
      .rowsBetween(Long.MinValue, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__num",
        abs(col("__cuma").cast("decimal(38,0)") * col("__nb") -
          col("__cumb").cast("decimal(38,0)") * col("__na")))
      .withColumn("__mx", max(col("__num")).over(wAll))
      .filter(col("__num") === col("__mx"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"))
      .agg(min(col("__v")).as("d_at"), max(col("__mx")).as("__m"))
      .withColumn("d", col("__m").cast("double") /
        (col("n_a").cast("double") * col("n_b").cast("double")))
      .drop("__m")
  }

  /** Welch's unequal-variance t-test between two groups of `valueCol`,
    * from exact sufficient statistics: per-group n, Σx, Σx² accumulate
    * in decimal (order-independent), then mean / sample variance /
    * t / t² / Welch–Satterthwaite dof are a PINNED sequence of double
    * ops any engine replays bit-for-bit (sqrt is IEEE
    * correctly-rounded — the outliersZ precedent). One map-side-combined
    * aggregate over the corpus; the comparison itself is a one-row
    * frame. Output: one row — (n_a, n_b, mean_a, mean_b, var_a, var_b,
    * t, t2, dof). Groups with n < 2 yield null variance columns (the
    * test is undefined). */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             groupA: String, groupB: String, scale: Int = 2): DataFrame = {
    val v = col(valueCol).cast(s"decimal(18,$scale)")
    def side(g: String, suffix: String) = Seq(
      sum(when(col(groupCol) === g, 1L).otherwise(0L)).as(s"n_$suffix"),
      sum(when(col(groupCol) === g, v)).cast("double").as(s"__s_$suffix"),
      sum(when(col(groupCol) === g, v * v)).cast("double").as(s"__ss_$suffix"))
    val aggs = side(groupA, "a") ++ side(groupB, "b")
    def mean(s: String) = col(s"__s_$s") / col(s"n_$s").cast("double")
    def variance(s: String) =
      when(col(s"n_$s") >= 2,
        (col(s"__ss_$s") - col(s"__s_$s") * col(s"__s_$s") / col(s"n_$s").cast("double")) /
          (col(s"n_$s").cast("double") - lit(1.0)))
    df.agg(aggs.head, aggs.tail: _*)
      .withColumn("mean_a", mean("a")).withColumn("mean_b", mean("b"))
      .withColumn("var_a", variance("a")).withColumn("var_b", variance("b"))
      .withColumn("__se2",
        col("var_a") / col("n_a").cast("double") +
          col("var_b") / col("n_b").cast("double"))
      .withColumn("t", (col("mean_a") - col("mean_b")) / sqrt(col("__se2")))
      .withColumn("t2",
        (col("mean_a") - col("mean_b")) * (col("mean_a") - col("mean_b")) / col("__se2"))
      .withColumn("dof",
        col("__se2") * col("__se2") /
          ((col("var_a") / col("n_a").cast("double")) * (col("var_a") / col("n_a").cast("double")) /
            (col("n_a").cast("double") - lit(1.0)) +
           (col("var_b") / col("n_b").cast("double")) * (col("var_b") / col("n_b").cast("double")) /
            (col("n_b").cast("double") - lit(1.0))))
      .drop("__s_a", "__ss_a", "__s_b", "__ss_b", "__se2")
  }

  def outliersZ(df: DataFrame, keyCols: Seq[String], valueCol: String,
                k: Double, scale: Int = 2): DataFrame = {
    require(k >= 0, s"k must be non-negative, got $k")
    val v = col(valueCol).cast(s"decimal(18,$scale)")
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(v).cast("double").as("__s"),
        sum(v * v).cast("double").as("__ss"))
    df.join(broadcast(stats), keyCols)
      .withColumn("mean", col("__s") / col("__n"))
      .withColumn("std",
        sqrt((col("__ss") - col("__s") * col("__s") / col("__n")) / col("__n")))
      .filter(abs(col(valueCol) - col("mean")) > lit(k) * col("std"))
      .withColumn("z", (col(valueCol) - col("mean")) / col("std"))
      .drop("__n", "__s", "__ss")
  }
}
