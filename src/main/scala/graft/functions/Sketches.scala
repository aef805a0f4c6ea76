package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{approx_count_distinct, col, count, expr, greatest, isnan, least, lit, max, min, sum, udaf, when}

/** OnlineStats-style mergeable aggregators (reference §2.4: `Mean`,
  * `Variance`, `Extrema`, `CountMap`, `Hist`, `KHist`; copy-per-chunk +
  * merge semantics at `src/reduce.jl:19-29`).
  *
  * Each is a Spark `Aggregator[IN, BUF, OUT]`: the buffer is the mergeable
  * state, `reduce` is the reference's `fit!`, `merge` is OnlineStats'
  * `merge` — Spark runs them as partial aggregates (map-side combine) +
  * merge after a shuffle of buffers only, exactly the reference's
  * per-chunk-then-tree-merge execution. Buffers are tiny (O(bins)), so at
  * 100 TB the shuffle carries `partitions × buffer` bytes, not data.
  */
object Sketches {

  /** Mean/Variance/Extrema in one pass (Welford/Chan parallel merge). */
  final case class Moments(n: Long, mean: Double, m2: Double, min: Double, max: Double)
  final case class MomentsOut(n: Long, mean: Double, variance: Double, min: Double, max: Double)

  object MomentsAgg extends Aggregator[Double, Moments, MomentsOut] {
    def zero: Moments = Moments(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    def reduce(b: Moments, x: Double): Moments = {
      val n1 = b.n + 1
      val d = x - b.mean
      val mean1 = b.mean + d / n1
      Moments(n1, mean1, b.m2 + d * (x - mean1), math.min(b.min, x), math.max(b.max, x))
    }
    def merge(a: Moments, b: Moments): Moments =
      if (a.n == 0) b else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        Moments(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n,
          math.min(a.min, b.min), math.max(a.max, b.max))
      }
    def finish(b: Moments): MomentsOut =
      MomentsOut(b.n, b.mean, if (b.n > 1) b.m2 / (b.n - 1) else Double.NaN, b.min, b.max)
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[MomentsOut] = Encoders.product[MomentsOut]
  }

  /** Approximate distinct count (OnlineStats `HyperLogLog`; reference
    * integration surface `src/JuliaDB.jl` reduce/groupreduce over
    * OnlineStats objects): Spark's native HLL++ aggregate
    * (`approx_count_distinct`), which IS the 100 TB shape — a fixed
    * 2^p-register buffer per group, order-independent register-max merge
    * (deterministic under any partitioning — spec'd by partition sweep),
    * map-side partial aggregation, no shuffle of distinct values. `rsd`
    * is the target relative standard deviation (Spark sizes p from it).
    * Like the KHist quantile gate (q43), the estimator is oracle-gated
    * by its ERROR CONTRACT: q128 emits exact distinct + an in-query
    * within-bound flag the SQL oracle asserts is 1 — no engine can
    * recompute another engine's HLL registers, but any engine can check
    * the estimate's contract against the exact answer. */
  def approxDistinct(c: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(c, rsd)

  /** Count-Min sketch over a long key column — the point-frequency
    * estimator completing the sketch family (CountMap/SpaceSaving answer
    * "which keys are heavy"; CM answers "how often is THIS key" in fixed
    * memory): Spark's native `count_min_sketch` aggregate builds a d×w
    * counter grid (d = ⌈ln(1/(1−confidence))⌉, w = ⌈e/eps⌉) with map-side
    * partial merge — counter addition is commutative, so the sketch is
    * identical under ANY partitioning (spec-pinned), and at 100 TB the
    * exchange carries one O(d·w) buffer per group, never the keys.
    * Returns the serialized sketch. */
  def countMinAgg(c: Column, eps: Double, confidence: Double,
                  seed: Int): Column =
    org.apache.spark.sql.functions.count_min_sketch(
      c, lit(eps), lit(confidence), lit(seed))

  /** Probe `keys` against a sketch built over `df[keyCol]`: returns
    * (keyCol, est, total). The collect is the sketch ITSELF — O(d·w)
    * bytes regardless of data size (the IVF-centroid pattern), probed
    * driver-side because no SQL surface exists for point queries into a
    * serialized sketch. Contract (the q43/q128 estimator-gate pattern):
    * est ≥ true always, and est ≤ true + eps·total with per-key
    * probability ≥ confidence — q150 emits exact counts plus an in-query
    * within-bound flag the oracle asserts. */
  def countMinEstimates(df: DataFrame, keyCol: String, eps: Double,
                        confidence: Double, seed: Int,
                        keys: Seq[Long]): DataFrame = {
    val bin = df.agg(countMinAgg(col(keyCol), eps, confidence, seed).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bin))
    val spark = df.sparkSession
    import spark.implicits._
    keys.map(k => (k, cms.estimateCount(Long.box(k)), cms.totalCount()))
      .toDF(keyCol, "est", "total")
  }

  /** Fixed-range histogram (OnlineStats `Hist`): `nbins` equal bins over
    * [lo, hi); out-of-range clamps to edge bins; NaN inputs are skipped
    * (a NaN would otherwise cast to bin 0 and silently pollute it). */
  final case class HistAgg(lo: Double, hi: Double, nbins: Int)
      extends Aggregator[Double, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(nbins)(0L)
    def reduce(b: Array[Long], x: Double): Array[Long] = {
      if (x.isNaN) return b
      val raw = ((x - lo) / (hi - lo) * nbins).toInt
      val i = math.min(math.max(raw, 0), nbins - 1)
      b(i) += 1; b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < nbins) { a(i) += b(i); i += 1 }; a
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
    def outputEncoder: Encoder[Seq[Long]] = ExprEncoders.longSeq
  }

  /** Adaptive histogram (OnlineStats `KHist`): keep ≤ k (value, weight)
    * centroids; on overflow merge the closest pair — a t-digest-like
    * mergeable sketch. Deterministic given input order within partitions
    * is fixed; used for approximate quantiles/plots, not exact oracles. */
  final case class KHistBuf(centers: Seq[(Double, Long)])
  final case class KHistAgg(k: Int) extends Aggregator[Double, KHistBuf, Seq[(Double, Long)]] {
    def zero: KHistBuf = KHistBuf(Vector.empty)
    private def insert(cs: Seq[(Double, Long)], x: Double, w: Long): Seq[(Double, Long)] = {
      val idx = cs.indexWhere(_._1 >= x)
      val withNew =
        if (idx >= 0 && cs(idx)._1 == x) cs.updated(idx, (x, cs(idx)._2 + w))
        else if (idx >= 0) (cs.take(idx) :+ ((x, w))) ++ cs.drop(idx)
        else cs :+ ((x, w))
      compress(withNew)
    }
    private def compress(cs: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (cs.size <= k) cs
      else {
        // merge the adjacent pair with the smallest gap (weighted mean)
        var bi = 0; var bg = Double.MaxValue
        var i = 0
        while (i < cs.size - 1) {
          val g = cs(i + 1)._1 - cs(i)._1
          if (g < bg) { bg = g; bi = i }
          i += 1
        }
        val (x1, w1) = cs(bi); val (x2, w2) = cs(bi + 1)
        val merged = ((x1 * w1 + x2 * w2) / (w1 + w2), w1 + w2)
        compress((cs.take(bi) :+ merged) ++ cs.drop(bi + 2))
      }
    def reduce(b: KHistBuf, x: Double): KHistBuf = KHistBuf(insert(b.centers, x, 1L))
    def merge(a: KHistBuf, b: KHistBuf): KHistBuf =
      KHistBuf(b.centers.foldLeft(a.centers) { case (cs, (x, w)) => insert(cs, x, w) })
    def finish(b: KHistBuf): Seq[(Double, Long)] = b.centers
    def bufferEncoder: Encoder[KHistBuf] = Encoders.product[KHistBuf]
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExprEncoders.pairSeq
  }

  /** Approximate quantile from a KHist sketch, interpolating between
    * centroid rank positions (OnlineStats quantile-from-KHist recipe).
    * Centroid i's representative rank is `cum + (w-1)/2` — the middle of
    * the ranks its weight covers — and the target rank is `q·(n−1)`, the
    * same convention as SQL `percentile`/`quantile_cont`: while the sketch
    * is EXACT (no compression has happened), this returns exactly the
    * interpolated percentile; after compression it is the usual
    * t-digest-style approximation. */
  def khistQuantile(centers: Seq[(Double, Long)], q: Double): Double = {
    require(centers.nonEmpty, "empty sketch")
    val n = centers.map(_._2).sum
    val t = q * (n - 1)
    var cum = 0L
    var prevPos = Double.NaN
    var prevX = Double.NaN
    centers.foreach { case (x, w) =>
      val pos = cum + (w - 1) / 2.0
      if (t <= pos) {
        return if (prevPos.isNaN || pos == prevPos) x
        else prevX + (x - prevX) * (t - prevPos) / (pos - prevPos)
      }
      prevPos = pos; prevX = x; cum += w
    }
    centers.last._1
  }

  /** CountMap (OnlineStats `CountMap`): value→count map with a capacity
    * cap. EXACT while distinct keys ≤ maxKeys (the reference's CountMap is
    * unbounded/exact); beyond that, lightest keys are evicted in amortized
    * batches (eviction at 2×maxKeys), so late-arriving heavy hitters can be
    * undercounted — size maxKeys above the expected cardinality, or use a
    * plain groupBy for exact heavy-hitter counting at scale. */
  final case class CountMapAgg(maxKeys: Int = 10000)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    private def cap(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= 2 * maxKeys) m
      else m.toSeq.sortBy { case (k, v) => (-v, k) }.take(maxKeys).toMap
    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      cap(b.updated(x, b.getOrElse(x, 0L) + 1L))
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      cap(b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) })
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExprEncoders.strLongMap
    def outputEncoder: Encoder[Map[String, Long]] = ExprEncoders.strLongMap
  }

  /** Heavy-hitter-CORRECT count map: space-saving counters (Metwally et
    * al.; merge per Agarwal et al., "Mergeable Summaries"). At most
    * `capacity` (key → (count, err)) entries, where `count` overestimates
    * the true frequency by at most `err`: true ∈ [count − err, count].
    * Unlike [[CountMapAgg]]'s lightest-key eviction (which can undercount a
    * LATE-arriving heavy hitter), any key with true frequency > N/capacity
    * is guaranteed present, whatever the arrival order — the bounded-error
    * upgrade the CountMap cap caveat asks for. Exact (err = 0) while
    * distinct keys ≤ capacity. Eviction is O(capacity) per new key at
    * saturation — sized for sketch capacities (10³–10⁵), not as a groupBy
    * replacement. */
  final case class SSEntry(key: String, count: Long, err: Long)
  final case class SpaceSavingAgg(capacity: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[SSEntry]] {
    require(capacity > 0, "space-saving capacity must be positive")
    def zero: Map[String, (Long, Long)] = Map.empty
    def reduce(b: Map[String, (Long, Long)], x: String): Map[String, (Long, Long)] =
      b.get(x) match {
        case Some((c, e)) => b.updated(x, (c + 1, e))
        case None if b.size < capacity => b.updated(x, (1L, 0L))
        case None =>
          // evict the min-count key (deterministic key tiebreak); the
          // newcomer inherits that count as its error bound — it may have
          // occurred up to `min` times before being tracked
          val (mk, (mc, _)) = b.minBy { case (k, (c, _)) => (c, k) }
          (b - mk).updated(x, (mc + 1, mc))
      }
    def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      // a key absent from a FULL summary may have been evicted holding up
      // to that summary's min count — charge (min, min) for absent keys so
      // the overestimate invariant survives the merge; absent from a
      // non-full summary means truly unseen (0, 0).
      val minA = if (a.size >= capacity) a.values.iterator.map(_._1).min else 0L
      val minB = if (b.size >= capacity) b.values.iterator.map(_._1).min else 0L
      val summed = (a.keySet ++ b.keySet).iterator.map { k =>
        val (ca, ea) = a.getOrElse(k, (minA, minA))
        val (cb, eb) = b.getOrElse(k, (minB, minB))
        k -> (ca + cb, ea + eb)
      }.toMap
      if (summed.size <= capacity) summed
      // keep the top `capacity` by count: every dropped count ≤ the kept
      // min, so the absent-key charge above still covers dropped keys
      else summed.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity).toMap
    }
    def finish(b: Map[String, (Long, Long)]): Seq[SSEntry] =
      b.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
        .map { case (k, (c, e)) => SSEntry(k, c, e) }
    def bufferEncoder: Encoder[Map[String, (Long, Long)]] = ExprEncoders.ssBuf
    def outputEncoder: Encoder[Seq[SSEntry]] = ExprEncoders.ssSeq
  }

  /** 2-D count map (OnlineStats `Mosaic`, reference `docs/src/plotting.md`):
    * (x, y) category-pair → count, keyed with a \u0001 separator (a space
    * would collide multi-word categories); same cap semantics as
    * CountMapAgg. */
  final case class MosaicAgg(maxKeys: Int = 10000)
      extends Aggregator[(String, String), Map[String, Long], Map[String, Long]] {
    private def key(x: String, y: String) = x + MosaicAgg.Sep + y
    def zero: Map[String, Long] = Map.empty
    private def cap(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= 2 * maxKeys) m
      else m.toSeq.sortBy { case (k, v) => (-v, k) }.take(maxKeys).toMap
    def reduce(b: Map[String, Long], x: (String, String)): Map[String, Long] = {
      val k = key(x._1, x._2)
      cap(b.updated(k, b.getOrElse(k, 0L) + 1L))
    }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      cap(b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) })
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExprEncoders.strLongMap
    def outputEncoder: Encoder[Map[String, Long]] = ExprEncoders.strLongMap
  }

  object MosaicAgg { val Sep = "\u0001" }

  /** x-binned y-summary (OnlineStats `IndexedPartition`): fixed x bins over
    * [lo, hi), each holding mergeable y-Moments — the 2-D profile sketch
    * behind partitionplot. */
  final case class IndexedPartitionAgg(lo: Double, hi: Double, nbins: Int)
      extends Aggregator[(Double, Double), Array[Moments], Seq[MomentsOut]] {
    def zero: Array[Moments] = Array.fill(nbins)(MomentsAgg.zero)
    def reduce(b: Array[Moments], xy: (Double, Double)): Array[Moments] = {
      if (xy._1.isNaN) return b // NaN x has no bin (would cast to bin 0)
      val raw = ((xy._1 - lo) / (hi - lo) * nbins).toInt
      val i = math.min(math.max(raw, 0), nbins - 1)
      b(i) = MomentsAgg.reduce(b(i), xy._2); b
    }
    def merge(a: Array[Moments], b: Array[Moments]): Array[Moments] = {
      var i = 0; while (i < nbins) { a(i) = MomentsAgg.merge(a(i), b(i)); i += 1 }; a
    }
    def finish(b: Array[Moments]): Seq[MomentsOut] = b.toSeq.map(MomentsAgg.finish)
    def bufferEncoder: Encoder[Array[Moments]] = ExprEncoders.momentsArray
    def outputEncoder: Encoder[Seq[MomentsOut]] = ExprEncoders.momentsOutSeq
  }

  /** Plot-DATA form of the reference's `partitionplot` (`src/recipes.jl:
    * 1-41`): the by-grouped IndexedPartition reduce whose output the plot
    * recipe renders — x binned over [lo, hi) into `bins` clamped bins
    * (same edge semantics as [[IndexedPartitionAgg]]: out-of-range values
    * land in the edge bins, NaN x is dropped), per-bin y count/mean/min/
    * max, optionally per `by` group. Rendering stays out of scope; this
    * table IS what `src/recipes.jl` computes before handing to Plots.
    * NaN/null rows (either column) are DROPPED — a plot can't place them,
    * and this is the one documented divergence from the sketch twin,
    * whose Moments mean a NaN y would poison to NaN.
    *
    * Lowered to the §2.4 groupBy fast path (one map-side-combined
    * aggregate keyed on (by…, bin) — the SQL-expressible twin of the
    * [[IndexedPartitionAgg]] sketch, which remains the mergeable/streaming
    * form). The mean accumulates through an exact decimal sum, so results
    * are deterministic under any partitioning. */
  def partitionplotData(df: DataFrame, xCol: String, yCol: String,
                        byCols: Seq[String], lo: Double, hi: Double,
                        bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val step = (hi - lo) / bins
    val bin = least(greatest(
      ((col(xCol) - lo) / (hi - lo) * bins).cast("int"), lit(0)), lit(bins - 1))
      .cast("long")
    // NaN y must go too: the decimal cast would turn it into NULL, so
    // sum would skip the row while count still counted it — a silently
    // BIASED mean instead of either NaN or a dropped row
    df.filter(col(xCol).isNotNull && !isnan(col(xCol)) &&
        col(yCol).isNotNull && !isnan(col(yCol)))
      .groupBy((byCols.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"),
        (sum(col(yCol).cast("decimal(28,4)")).cast("double") / count(lit(1))).as("mean_y"),
        min(col(yCol)).cast("double").as("min_y"),
        max(col(yCol)).cast("double").as("max_y"))
      .withColumn("x_lo", lit(lo) + col("bin") * step)
      .withColumn("x_hi", lit(lo) + (col("bin") + 1) * step)
      .select((byCols.map(col) :+ col("bin") :+ col("x_lo") :+ col("x_hi") :+
        col("n") :+ col("mean_y") :+ col("min_y") :+ col("max_y")): _*)
  }

  /** OnlineStats `Partition(stat, nparts)` (reference `src/recipes.jl`,
    * `docs/src/plotting.md`): the value column summarized over `nparts`
    * contiguous chunks of the table in GLOBAL pkey order — "arrival order",
    * which a distributed engine must define as the table's sort order. rows
    * are numbered with the same partition-offset zipWithIndex machinery as
    * `subtable` (no single-task window), then fed to [[IndexedPartitionAgg]]
    * over the position axis. Two jobs (zipWithIndex's count + the
    * aggregation), both fully parallel. */
  def partitionSketch(t: graft.core.JTable, valueCol: String,
                      nparts: Int): Seq[MomentsOut] = {
    require(t.pkey.nonEmpty, "partitionSketch requires a pkey (sequence = pkey order)")
    require(t.df.columns.contains(valueCol), s"no column $valueCol")
    val sorted = t.df
      // null values (or doubles the cast nulls out) are dropped BEFORE the
      // position numbering — getDouble on a null cell would NPE the job
      .select(t.pkey.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .orderBy(t.pkey.map(col): _*)
    val vIdx = sorted.columns.length - 1
    val posVal = sorted.rdd.zipWithIndex().map { case (r, i) =>
      (i.toDouble, r.getDouble(vIdx))
    }
    val n = posVal.count()
    val spark = t.spark
    import spark.implicits._
    posVal.toDF("pos", "v").as[(Double, Double)]
      .select(udaf(IndexedPartitionAgg(0.0, n.toDouble, nparts),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
        .apply(col("pos"), col("v")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => MomentsOut(r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
  }

  /** Plot-DATA form of the OnlineStats `Partition` sketch — the
    * SQL-expressible data twin of [[partitionSketch]] (the same
    * relationship [[partitionplotData]] has to [[IndexedPartitionAgg]]):
    * the value column summarized over `nparts` contiguous chunks of the
    * table in GLOBAL pkey order. Positions come from the same
    * partition-offset zipWithIndex machinery (no single-task window);
    * chunk assignment is PURE LONG arithmetic — part = pos·nparts div n —
    * which is exact at any n where the sketch twin's double binning
    * ((pos/n)·nparts cast to int) can land one off at representation
    * boundaries; the mean accumulates through an exact decimal sum so the
    * result is deterministic under any partitioning. Null values (or
    * doubles the cast nulls out) and NaNs are dropped BEFORE the position
    * numbering — the same contract as [[partitionplotData]], and the same
    * DOCUMENTED DIVERGENCE from the sketch twin: [[partitionSketch]]
    * keeps NaN values, whose Moments mean poisons to NaN (a plot can't
    * place them; the data form drops them). On NaN-free columns the two
    * forms are equal (spec-asserted on the fixture).
    *
    * The positioned rows are localCheckpointed before use: the chunk grid
    * needs n (a count) AND the aggregation over the same rows, and an
    * unmaterialized lineage would re-run the global sort + zipWithIndex
    * once per action (3× on a 100 TB table). One materialization, then a
    * cheap count + one map-side-combined groupBy on ≤ nparts keys. */
  def partitionData(t: graft.core.JTable, valueCol: String,
                    nparts: Int): DataFrame = {
    require(nparts > 0, s"nparts must be positive, got $nparts")
    require(t.pkey.nonEmpty, "partitionData requires a pkey (sequence = pkey order)")
    require(t.df.columns.contains(valueCol), s"no column $valueCol")
    val sorted = t.df
      .select(t.pkey.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull && !isnan(col("__v")))
      .orderBy(t.pkey.map(col): _*)
    val vIdx = sorted.columns.length - 1
    val posVal = sorted.rdd.zipWithIndex().map { case (r, i) => (i, r.getDouble(vIdx)) }
    val spark = t.spark
    import spark.implicits._
    val pv = posVal.toDF("pos", "v").localCheckpoint()
    val n = pv.count()
    pv.groupBy(expr(s"pos * $nparts div $n").as("part"))
      .agg(min(col("pos")).as("pos_lo"), max(col("pos")).as("pos_hi"),
        count(lit(1)).as("n"),
        (sum(col("v").cast("decimal(28,4)")).cast("double") / count(lit(1))).as("mean_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  // ---- Column forms of the sketches (for combinators / plain .agg) --------

  /** Moments sketch as an untyped aggregate Column. */
  def momentsCol(c: Column): Column = udaf(MomentsAgg, Encoders.scalaDouble).apply(c)
  /** Fixed-bin histogram as an untyped aggregate Column. */
  def histCol(lo: Double, hi: Double, nbins: Int)(c: Column): Column =
    udaf(HistAgg(lo, hi, nbins), Encoders.scalaDouble).apply(c)
  /** CountMap as an untyped aggregate Column. */
  def countmapCol(maxKeys: Int = 10000)(c: Column): Column =
    udaf(CountMapAgg(maxKeys), Encoders.STRING).apply(c)
  /** Space-saving count map as an untyped aggregate Column — same shape as
    * [[countmapCol]] but with the heavy-hitter guarantee; yields
    * array<struct<key, count, err>> sorted by (count desc, key). */
  def spaceSavingCol(capacity: Int)(c: Column): Column =
    udaf(SpaceSavingAgg(capacity), Encoders.STRING).apply(c)
  /** Mosaic (2-D countmap) as an untyped aggregate Column over (x, y). */
  def mosaicCol(maxKeys: Int = 10000)(x: Column, y: Column): Column =
    udaf(MosaicAgg(maxKeys), Encoders.tuple(Encoders.STRING, Encoders.STRING)).apply(x, y)
  /** KHist as an untyped aggregate Column — yields
    * array<struct<_1: center, _2: weight>>; pair with [[khistQuantileCol]]
    * (or [[khistQuantile]] driver-side) to read quantiles off the sketch.
    * Mergeable, so it runs identically under Structured Streaming windows
    * (see `Streams.windowedQuantiles`). */
  def khistCol(k: Int)(c: Column): Column =
    udaf(KHistAgg(k), Encoders.scalaDouble).apply(c)
  /** Quantile walk over a KHist sketch column (the [[khistQuantile]]
    * recipe as a scalar function). Runs per GROUP row — one sketch per
    * window/key, never per input row — so a plain Scala UDF is fine here;
    * the per-row hot path is the aggregator above. */
  def khistQuantileCol(q: Double)(sketch: Column): Column = {
    val f = org.apache.spark.sql.functions.udf { centers: Seq[org.apache.spark.sql.Row] =>
      if (centers == null || centers.isEmpty) Double.NaN
      else khistQuantile(centers.map(r => (r.getDouble(0), r.getLong(1))), q)
    }
    f(sketch)
  }

  /** OnlineStats combinators (reference `docs/src/onlinestats.md:24-47`,
    * `src/recipes.jl:7-30`): `Series` fits several stats over ONE selection,
    * `Group` one stat per column, `FTSeries` filters/transforms before
    * fitting. The reference builds these so N sketches share a single data
    * pass; in Spark the same guarantee comes from handing ALL the aggregate
    * expressions to a single `agg(...)` — Catalyst plans one partial
    * aggregate → ONE Exchange → one final aggregate, so the data is read
    * once and the shuffle carries N small buffers, exactly OnlineStats'
    * one-`fit!`-loop execution (the spec pins the single Exchange). */
  object Combinators {
    /** A named stat: output column name → aggregate constructor. */
    type Stat = (String, Column => Column)

    /** `Series(Mean(), Variance(), …)` — every stat over the same input. */
    def series(input: Column, stats: Stat*): Seq[Column] =
      stats.map { case (n, f) => f(input).as(n) }.toSeq

    /** `Group(stat₁ ⇒ col₁, …)` / `3Mean` — the i-th stat fits the i-th
      * column (reference `Group(Mean(), Mean(), Mean())` over a tuple). */
    def group(pairs: (Column, Stat)*): Seq[Column] =
      pairs.map { case (c, (n, f)) => f(c).as(n) }.toSeq

    /** `FTSeries(stats…; filter, transform)` — rows failing `pred` are
      * skipped, survivors pass through `t` before fitting. Lowered as a
      * per-stat `when` guard (nulls are ignored by aggregates), so it is
      * still one pass / one Exchange. */
    def ftSeries(input: Column, pred: Column => Column, t: Column => Column,
                 stats: Stat*): Seq[Column] = {
      val guarded = when(pred(input), t(input))
      stats.map { case (n, f) => f(guarded).as(n) }.toSeq
    }

    /** Fit the combined stats in one aggregation pass (whole-table `reduce`
      * or per-group `groupreduce` shape). */
    def reduceAll(df: DataFrame, by: Seq[String], cols: Seq[Column]): DataFrame =
      if (by.isEmpty) df.agg(cols.head, cols.tail: _*)
      else df.groupBy(by.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  private object ExprEncoders {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import scala.reflect.runtime.universe.TypeTag
    private def of[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()
    val longArray: Encoder[Array[Long]] = of[Array[Long]]
    val longSeq: Encoder[Seq[Long]] = of[Seq[Long]]
    val pairSeq: Encoder[Seq[(Double, Long)]] = of[Seq[(Double, Long)]]
    val strLongMap: Encoder[Map[String, Long]] = of[Map[String, Long]]
    val ssBuf: Encoder[Map[String, (Long, Long)]] = of[Map[String, (Long, Long)]]
    val ssSeq: Encoder[Seq[SSEntry]] = of[Seq[SSEntry]]
    val momentsArray: Encoder[Array[Moments]] = of[Array[Moments]]
    val momentsOutSeq: Encoder[Seq[MomentsOut]] = of[Seq[MomentsOut]]
  }
}
