package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-log operator the
  * reference expresses with `groupby` + ShiftedArrays.lag over a sorted
  * table (`src/flatten.jl` + window idioms, docs/src/api/aggregation.md);
  * here it is one declarative composition that Catalyst runs with a
  * SINGLE shuffle.
  *
  * Semantics (matches Spark's native `session_window`): events of the same
  * key belong to one session while each consecutive gap is < `gapUs`; a
  * gap ≥ `gapUs` starts a new session. Session identity is the session's
  * first event time — stable, engine-portable, and unique per key.
  *
  * Plan shape / 100 TB audit: the boundary lag, the running-sum session
  * index, and the per-session aggregate ALL require clustering by a subset
  * of (key..., session_idx), so EnsureRequirements inserts exactly one
  * hash Exchange on the key; everything downstream reuses it (the window
  * sorts are partition-local). The per-key sort is the unavoidable cost of
  * gap semantics — order defines the gaps — and it spills via the
  * out-of-core sort path (SpillProof's regime), so a hot key degrades to
  * disk, not OOM. Skewed keys: sessionization is inherently per-key
  * sequential (like asof); for a pathologically hot key the salting
  * pattern of Joins.asofJoinSalted applies to the boundary pass, but the
  * running index is a prefix sum — salt buckets would need a carry — so
  * the honest lever at scale is the same one the stress arms measured for
  * asof: bound the key's row count upstream (dedup, sampling) or accept
  * the sequential cost.
  */
object Sessions {

  /** Assign each event its session: input columns + `session_start`
    * (first event ts of the session, same type as `tsCol`). One shuffle.
    *
    * `tieCols` break ordering ties WITHIN equal `tsCol` values; session
    * assignment itself depends only on `tsCol` (equal timestamps always
    * share a session: their gap is 0), so the result is deterministic
    * even when ties exist — the tiebreak only stabilizes row order for
    * downstream consumers. */
  /** df + `__session_idx` (per-key running session ordinal). */
  private def indexed(df: DataFrame, keyCols: Seq[String], tsCol: String,
                      gapUs: Long, tieCols: Seq[Column]): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc +: tieCols: _*)
    // ROWS frame, not the RANGE default: with tied timestamps the RANGE
    // frame peeks at peers' boundary flags — same result for the flag sum
    // (ties never open a session) but ROWS is the contract both engines
    // state identically
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || (col(tsCol) - prev >= lit(gapUs)), 1L)
      .otherwise(0L)
    df.withColumn("__session_new", isNew)
      .withColumn("__session_idx", sum(col("__session_new")).over(run))
      .drop("__session_new")
  }

  def assignSessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     gapUs: Long, tieCols: Seq[Column] = Nil): DataFrame =
    indexed(df, keyCols, tsCol, gapUs, tieCols)
      // session_start = first ts of the (key, idx) group: a second window
      // over (key..., __session_idx) — clustering is satisfied by the
      // existing hash partitioning on the key (subset rule), so this adds
      // a partition-local sort, not an Exchange
      .withColumn("session_start",
        min(col(tsCol)).over(
          Window.partitionBy((keyCols :+ "__session_idx").map(col): _*)))
      .drop("__session_idx")

  /** Per-session aggregate: one row per (key..., session), with
    * `session_start`/`session_end` (first/last event ts) and the caller's
    * aggregates. Same single Exchange as [[assignSessions]] — the final
    * groupBy's clustering requirement is satisfied by the window's hash
    * partitioning on the key subset. Groups on the session ORDINAL and
    * folds session_start into the aggregate itself (min ts), skipping
    * assignSessions' second window pass entirely — one window sort, one
    * aggregate, zero extra sorts (measured 0.88 → 0.68 s on the q129
    * bench shape at sf0.1/32). */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   gapUs: Long, aggs: (String, Column)*): DataFrame = {
    val aggCols = (min(col(tsCol)).as("session_start") +:
      max(col(tsCol)).as("session_end") +:
      aggs.map { case (n, c) => c.as(n) })
    indexed(df, keyCols, tsCol, gapUs, Nil)
      .groupBy((keyCols :+ "__session_idx").map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .drop("__session_idx")
      .select((keyCols :+ "session_start" :+ "session_end").map(col) ++
        aggs.map { case (n, _) => col(n) }: _*)
  }
}
