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
