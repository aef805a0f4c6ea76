package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Core table type: a thin wrapper over `DataFrame` carrying the primary-key
  * (`pkey`) invariant of the reference's `DIndexedTable` (reference
  * `src/table.jl:21-27`): when `pkey` is non-empty the underlying plan is
  * range-partitioned and sorted-within-partitions by those columns.
  *
  * Scale rationale: the reference maintains sorted, range-chunked tables so
  * that grouping/joining on the pkey needs no data movement (reference
  * `src/reduce.jl:85-104`). In Spark the same invariant means the
  * `Exchange(rangepartitioning)` + `Sort` already in the plan are reused by
  * Catalyst for downstream sort-merge joins and sort-based aggregations on a
  * pkey prefix — the shuffle is paid once, not per operator. On a real
  * cluster the equivalent persisted form is a bucketed/sorted table write.
  */
final class JTable private (val df: DataFrame, val pkey: Seq[String]) {
  def spark: SparkSession = df.sparkSession
  def columns: Seq[String] = df.columns.toSeq

  private def keyed(newDf: DataFrame, newPkey: Seq[String]): JTable =
    JTable(newDf, newPkey)
  /** Wrap a derived plan that provably preserves the partition+sort order
    * (narrow transformations only: projection keeping pkey cols, filter). */
  private def orderPreserving(newDf: DataFrame): JTable = new JTable(newDf, pkey)

  // ---- selection (§2.2) ----------------------------------------------------

  /** `select(t, sel)` — project per the selector language. Keeps the pkey
    * invariant only when every pkey column survives via a PLAIN (identity)
    * selector — a `Fn`/`As`/`Expr` selector may transform or shadow a pkey
    * column, which would silently break sortedness. */
  def select(sels: Sel*): JTable = {
    val cols = sels.flatMap(s => Sel.compile(df, pkey, s))
    val plainNames = sels.filter(Sel.isPlain).flatMap(s => Sel.names(df, pkey, s))
    val transformed = sels.filterNot(Sel.isPlain).flatMap(s => Sel.names(df, pkey, s)).toSet
    val kept = pkey.filter(k => plainNames.contains(k) && !transformed.contains(k))
    val out = df.select(cols: _*)
    if (kept == pkey) new JTable(out, pkey) else new JTable(out, Nil)
  }

  /** `filter(f, t; select)` — predicate over rows or selected columns. */
  def filter(pred: Column): JTable = orderPreserving(df.filter(pred))
  /** Tuple-of-pairs conjunction form: `filter(t, (a = p1, b = p2))`. */
  def filterAll(preds: (String, Column => Column)*): JTable =
    orderPreserving(df.filter(preds.map { case (c, p) => p(col(c)) }.reduce(_ && _)))

  /** `map(f, t; select)` with an expression-valued f: stays in codegen. */
  def mapExpr(f: Seq[Column]): JTable = new JTable(df.select(f: _*), Nil)

  /** `dropmissing(t, cols)` (reference `src/selection.jl:8-12`). */
  def dropmissing(cols: String*): JTable =
    orderPreserving(if (cols.isEmpty) df.na.drop() else df.na.drop(cols.toArray))

  /** `convertmissing(t, missingtype)` (reference `src/selection.jl:14-18`):
    * the reference converts columns between its two missing representations
    * (`Missing` union vs `DataValue` wrapper). Spark's native representation
    * is the nullable column ("null"); the `DataValue` analog is "flagged" —
    * an explicit `struct<value, present: boolean>` per converted column,
    * which downstream logic can treat as data (group on presence, carry
    * through joins that would otherwise conflate "missing" with "no match").
    * Narrow projection both ways; `convertmissing(convertmissing(t,
    * "flagged"), "null")` round-trips losslessly. */
  def convertmissing(missingtype: String, cols: String*): JTable = {
    val targets = if (cols.isEmpty) df.columns.toSeq else cols.toSeq
    // pkey columns can't become structs (the sort/partition invariant is on
    // the plain values): the all-columns default skips them silently, but
    // an EXPLICIT request for one must fail loudly, not no-op.
    val explicitPkey = cols.filter(pkey.contains)
    require(explicitPkey.isEmpty,
      s"convertmissing: ${explicitPkey.mkString(", ")} are pkey columns — " +
        "they keep the plain (null) representation")
    missingtype match {
      case "flagged" =>
        val out = targets.filterNot(pkey.contains).foldLeft(df) { (d, c) =>
          d.withColumn(c, struct(col(c).as("value"), col(c).isNotNull.as("present")))
        }
        orderPreserving(out)
      case "null" =>
        val out = targets.foldLeft(df) { (d, c) =>
          d.schema(c).dataType match {
            case s: org.apache.spark.sql.types.StructType
                if s.fieldNames.sameElements(Array("value", "present")) =>
              d.withColumn(c, when(col(c)("present"), col(c)("value")))
            case _ => d
          }
        }
        orderPreserving(out)
      case other => throw new IllegalArgumentException(
        s"missingtype must be 'null' or 'flagged', got $other")
    }
  }

  /** `transform(t, name => col)` — add/replace a column; re-sorts when a pkey
    * column is replaced (reference `test/test_table.jl:83-85`). */
  def transform(pairs: (String, Column)*): JTable = {
    val out = pairs.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    if (pairs.exists { case (n, _) => pkey.contains(n) }) keyed(out, pkey)
    else orderPreserving(out)
  }

  /** `rename(t, old => new)`. */
  def rename(pairs: (String, String)*): JTable = {
    val out = pairs.foldLeft(df) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
    val newPkey = pkey.map(k => pairs.collectFirst { case (`k`, n) => n }.getOrElse(k))
    new JTable(out, newPkey)
  }

  /** `insertcolsafter(t, pos, name => col)` — positional column insertion. */
  def insertAfter(after: String, pairs: (String, Column)*): JTable = {
    val idx = df.columns.indexOf(after)
    require(idx >= 0, s"no column $after")
    val (pre, post) = df.columns.splitAt(idx + 1)
    val cols = pre.map(col) ++ pairs.map { case (n, c) => c.as(n) } ++ post.map(col)
    orderPreserving(df.select(cols.toSeq: _*))
  }

  // ---- ordering (§2.6) -----------------------------------------------------

  /** `reindex(t, by)` — establish a new pkey: one range shuffle + in-partition
    * sort (the reference's sample-sort `rechunk`, `src/sort.jl:28-68`; Spark's
    * `RangePartitioner` is also sample-based). */
  def reindex(by: String*): JTable = keyed(df, by)

  /** Full global sort by arbitrary columns (`sort(t, col)`). */
  def sortBy(cols: Column*): JTable = new JTable(df.orderBy(cols: _*), Nil)

  /** top-k: global `orderBy.limit(k)` — Spark plans this as a per-partition
    * TakeOrdered + driver merge, no full shuffle. */
  def topk(k: Int, cols: Column*): DataFrame = df.orderBy(cols: _*).limit(k)

  /** `distribute(t, n)` — explicit re-chunking. */
  def distribute(n: Int): JTable =
    if (pkey.isEmpty) new JTable(df.repartition(n), Nil)
    else new JTable(
      df.repartitionByRange(n, pkey.map(col): _*).sortWithinPartitions(pkey.map(col): _*),
      pkey)

  /** `distribute(t, rowgroups)` — explicit per-chunk row counts (reference
    * `src/ndsparse.jl:426-474`: `distribute(t, [n₁, n₂, …])`). Rows are
    * numbered in global pkey order (partition-offset zipWithIndex, same
    * machinery as [[subtable]]) and bucketed by the cumulative boundaries;
    * a range repartition on the bucket id gives chunk i exactly `groups(i)`
    * rows, in order. Rows beyond `groups.sum` overflow into the last chunk
    * (the reference requires the sizes to sum to length(t); we keep the
    * tail rather than throw a distributed size check). */
  def distribute(groups: Seq[Long]): JTable = {
    require(pkey.nonEmpty, "distribute(rowgroups) requires a pkey (chunks are pkey-ordered)")
    require(groups.nonEmpty && groups.forall(_ > 0), s"row-group sizes must be positive: $groups")
    val bounds = groups.scanLeft(0L)(_ + _).tail // cumulative upper bounds
    val sorted = df.orderBy(pkey.map(col): _*)
    val schema = sorted.schema
    val n = groups.size
    val boundsArr = bounds.toArray // binary-searchable: O(log chunks) per row
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      (JTable.chunkOf(i, boundsArr), r)
    }
    val parted = rows.partitionBy(new org.apache.spark.Partitioner {
      def numPartitions: Int = n
      def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }).map(_._2)
    new JTable(spark.createDataFrame(parted, schema)
      .sortWithinPartitions(pkey.map(col): _*), pkey)
  }

  /** `subtable(t, lo:hi)` — contiguous row-range by global pkey position,
    * 1-based inclusive (reference `src/ndsparse.jl:497-527`).
    *
    * Scale-safe lowering: global sort (range shuffle) + `zipWithIndex`,
    * which computes per-partition counts in one small job and assigns each
    * partition its cumulative offset — the reference's chunk-clipping by
    * per-chunk `nrows`, and NOT a `Window.orderBy` with no partitionBy
    * (that plan funnels the whole table through ONE window task; at 100 TB
    * it is a driver-equivalent bottleneck). zipWithIndex reuses the sorted
    * stage's shuffle files for its second pass, so the data is ranged once. */
  def subtable(lo: Long, hi: Long): DataFrame = {
    require(pkey.nonEmpty, "subtable requires a pkey (global position = pkey order)")
    require(lo >= 1 && hi >= lo, s"invalid 1-based row range [$lo, $hi]")
    val sorted = df.orderBy(pkey.map(col): _*)
    val schema = sorted.schema.add("__pos", org.apache.spark.sql.types.LongType, nullable = false)
    val rows = sorted.rdd.zipWithIndex()
      .filter { case (_, i) => i >= lo - 1 && i <= hi - 1 }
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1)) }
    spark.createDataFrame(rows, schema)
  }

  /** Append a global 1-based position column — the reference's implicit
    * `1:n` index (`loadndsparse` with no index columns, `src/io.jl:19-29`;
    * `offset_index!` renumbers chunks by cumulative offsets,
    * `src/io.jl:151-154`). Same partition-offset zipWithIndex machinery as
    * [[subtable]] — one small count job assigns each partition its
    * cumulative offset; never a single-task global window.
    *
    * Numbering order: global pkey order when a pkey exists (deterministic
    * under ANY re-chunking — the CoreSpec sweep pins this); with no pkey,
    * current partition order (the reference's arrival order — deterministic
    * for a fresh load, not under repartitioning). The result is keyed by
    * the new index column, which is globally sorted by construction. */
  def withRowIndex(name: String = "idx"): JTable = {
    require(!df.columns.contains(name), s"column $name already exists")
    val ordered = if (pkey.isEmpty) df else df.orderBy(pkey.map(col): _*)
    val schema = ordered.schema.add(name, org.apache.spark.sql.types.LongType, nullable = false)
    val rows = ordered.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1)) }
    JTable.assumeSorted(spark.createDataFrame(rows, schema), Seq(name))
  }

  // ---- materialization (§2.1) ---------------------------------------------

  /** `compute(t)` — force + keep distributed (cache). */
  def compute(): JTable = { df.cache(); df.count(); this }
  /** `collect(t)` — ordered collect to the driver. */
  def collectOrdered(): Array[Row] =
    (if (pkey.isEmpty) df else df.orderBy(pkey.map(col): _*)).collect()

  def show(n: Int = 20): Unit = df.show(n, truncate = false)

  /** Multiset equality across distributed tables (reference `==` at
    * `src/JuliaDB.jl:46-64`): symmetric exceptAll emptiness — two shuffles,
    * no driver materialization. */
  def equalsTable(other: JTable): Boolean =
    df.exceptAll(other.df).isEmpty && other.df.exceptAll(df).isEmpty
}

object JTable {
  /** Build with a pkey: pays one range shuffle + sort to establish the
    * reference's sortedness invariant. */
  def apply(df: DataFrame, pkey: Seq[String] = Nil, numPartitions: Int = 0): JTable =
    if (pkey.isEmpty) new JTable(df, Nil)
    else {
      val cols = pkey.map(col)
      val rp =
        if (numPartitions > 0) df.repartitionByRange(numPartitions, cols: _*)
        else df.repartitionByRange(cols: _*)
      new JTable(rp.sortWithinPartitions(cols: _*), pkey)
    }

  /** Wrap without establishing the invariant — caller asserts the frame is
    * already range-partitioned+sorted (e.g. derived order-preservingly). */
  def assumeSorted(df: DataFrame, pkey: Seq[String]): JTable = new JTable(df, pkey)

  /** Chunk index of global row position `i` given cumulative upper
    * `bounds`: first bound strictly greater than i, clamped into the last
    * chunk (overflow rows keep the tail). O(log chunks) binary search. */
  private[graft] def chunkOf(i: Long, bounds: Array[Long]): Int = {
    var lo = 0; var hi = bounds.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (i < bounds(mid)) hi = mid else lo = mid + 1
    }
    if (i < bounds(lo)) lo else bounds.length - 1
  }

  /** Constructor from distributed column vectors (reference
    * `src/table.jl:52-81`: `table(distributed vectors…)` picks the first
    * vector's chunking and distributes the others to match, then zips
    * chunk-wise). Each input is a single-column frame; rows pair by global
    * POSITION. Columns whose per-partition row counts already equal the
    * first column's zip in place — no data movement, the aligned fast
    * path; a misaligned column is realigned to the first column's chunking
    * by global position (zipWithIndex → explicit-bounds partitioner → one
    * in-partition sort, the same machinery as `distribute(rowgroups)`).
    * Per-chunk data must fit an executor — the reference's chunk contract.
    * RDD zip is the genuine per-partition imperative case: position-pairing
    * has no relational form that avoids a join keyed on row number.
    * COST: one counting pass per column plus the zip's pass (misaligned
    * columns number positions from the already-collected counts — no
    * second zipWithIndex count job) — cache the inputs first when their
    * lineage is expensive to recompute. */
  def fromColumns(columns: Seq[(String, DataFrame)], pkey: Seq[String] = Nil): JTable = {
    require(columns.nonEmpty, "fromColumns needs at least one column")
    columns.foreach { case (n, d) =>
      require(d.columns.length == 1, s"column $n: expected a single-column frame")
    }
    val rdds = columns.map(_._2.rdd)
    def partCounts(r: org.apache.spark.rdd.RDD[Row]): Array[Long] =
      r.mapPartitions(it => Iterator.single(it.size.toLong), preservesPartitioning = true)
        .collect()
    val c0 = partCounts(rdds.head)
    val n0 = c0.sum
    val bounds = c0.scanLeft(0L)(_ + _).tail
    val nParts = math.max(c0.length, 1)
    val aligned = rdds.head +: rdds.tail.zip(columns.tail).map { case (r, (name, _)) =>
      val ci = partCounts(r)
      if (ci.sameElements(c0)) r
      else {
        require(ci.sum == n0, s"column $name: length ${ci.sum} != first column's $n0")
        // global positions from the counts we ALREADY have (zipWithIndex
        // would run its own extra count job over the column)
        val offsets = ci.scanLeft(0L)(_ + _)
        r.mapPartitionsWithIndex({ (pi, it) =>
            var i = offsets(pi)
            it.map { row => val out = (i, row); i += 1; out }
          }, preservesPartitioning = true)
          .partitionBy(new org.apache.spark.Partitioner {
            def numPartitions: Int = nParts
            def getPartition(key: Any): Int = chunkOf(key.asInstanceOf[Long], bounds)
          })
          .mapPartitions(it => it.toArray.sortBy(_._1).iterator.map(_._2))
      }
    }
    val zipped = aligned.reduce { (a, b) =>
      a.zipPartitions(b) { (ia, ib) =>
        ia.zip(ib).map { case (x, y) => Row.fromSeq(x.toSeq ++ y.toSeq) }
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      columns.map { case (n, d) => d.schema.fields.head.copy(name = n) })
    val df = columns.head._2.sparkSession.createDataFrame(zipped, schema)
    JTable(df, pkey)
  }

  /** Wrap a frame that is co-partitioned by pkey (hash, e.g. a bucketed
    * read) and sorted within partitions. Every pkey-trusting operation
    * (groupBy/join/merge on the pkey, ordered collect via explicit sort)
    * is correct under either hash or range co-partitioning; only
    * global-order-sensitive fast paths would need true range partitioning. */
  def assumeCoPartitioned(df: DataFrame, pkey: Seq[String]): JTable = new JTable(df, pkey)
}
