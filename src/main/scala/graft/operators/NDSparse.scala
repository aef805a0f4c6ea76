package graft.operators

import graft.core.JTable
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** NDSparse veneer (reference §1.1, §2.2): the same keyed DataFrame viewed
  * as an N-d sparse array with arbitrary index columns. Lookups are filters
  * on the key prefix (partition/file pruning does the reference's
  * bounding-box chunk pruning, `src/join.jl:163-186`), dimension reductions
  * are groupBys over kept dims, and array broadcasting is an equi-join on
  * shared dims (`src/join.jl:269-335`).
  */
final case class NDSparse(table: JTable, dims: Seq[String], valueCols: Seq[String]) {
  private def df = table.df

  /** `nd[k1, k2, …]` — scalar lookup; KeyError semantics = empty result is
    * the caller's signal (reference `src/indexing.jl:2-44`). */
  def lookup(keys: Any*): DataFrame = {
    val preds = dims.zip(keys).collect { case (d, v) if v != null => col(d) === lit(v) }
    // no usable key (x[:] / all-null) selects every value, like the
    // reference's full-colon getindex — not an empty-reduce crash
    df.filter(preds.reduceOption(_ && _).getOrElse(lit(true)))
      .select(valueCols.map(col): _*)
  }

  /** Partial slice: fix a prefix of dims, keep the rest (`nd[x, :]`). */
  def slice(fixed: (String, Any)*): NDSparse = {
    val pred = fixed.map { case (d, v) => col(d) === lit(v) }.reduce(_ && _)
    copy(table = table.filter(pred))
  }

  /** Range slice along one dim (sorted-range getindex). */
  def sliceRange(dim: String, lo: Any, hi: Any): NDSparse =
    copy(table = table.filter(col(dim) >= lit(lo) && col(dim) <= lit(hi)))

  /** `reduce(f, x; dims)` — drop `dropDims`, aggregate values over kept
    * dims (reference `src/reduce.jl:107-115`). */
  def reducedim(dropDims: Seq[String], aggs: (String, Column)*): NDSparse = {
    val kept = dims.filterNot(dropDims.contains)
    val out = df.groupBy(kept.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    NDSparse(JTable(out, kept), kept, aggs.map(_._1))
  }

  /** `reducedim_vec(f, x, dims)` (reference `src/reduce.jl:117-134`): drop
    * `dropDims`, apply a VECTOR function to each kept-key group's values —
    * the vector-aggregate cousin of [[reducedim]]. Lowered through
    * `Aggregations.groupbyVector` (collect + deterministic sort + the
    * caller's array expression); same one-shuffle cost. */
  def reducedimVec(dropDims: Seq[String], valueCol: String,
                   vecagg: Column => Column, as: String = "value"): NDSparse = {
    val kept = dims.filterNot(dropDims.contains)
    val out = Aggregations.groupbyVector(table, kept, Seq(valueCol),
      arr => vecagg(transform(arr, r => r.getField(valueCol))), as)
    NDSparse(JTable(out, kept), kept, Seq(as))
  }

  /** `convertdim(t, d, xlate; agg)` — map one index dimension through a
    * function, merging collisions (reference `src/selection.jl:36-81`). */
  def convertdim(dim: String, xlate: Column => Column, aggs: (String, Column)*): NDSparse = {
    val mapped = df.withColumn(dim, xlate(col(dim)))
    val out = mapped.groupBy(dims.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    NDSparse(JTable(out, dims), dims, aggs.map(_._1))
  }

  /** `convertdim(t, d, xlate; vecagg)` — like [[convertdim]] but collisions
    * are merged by a VECTOR aggregate: `vecagg` sees the whole collision
    * group as an array column (reference `src/selection.jl:36-47`, the
    * `vecagg` keyword). Lowered as `collect_list` + the caller's
    * array-level expression — one shuffle, group payloads stay distributed.
    *
    * Element order: `collect_list` order is partition-dependent, so the
    * collected array is sorted ascending before `vecagg` — deterministic
    * under any partitioning. Divergence from the reference (which hands
    * vecagg the group in TABLE order): an order-sensitive vecagg sees
    * value order here; order-insensitive aggregates (median, sum, …) are
    * unaffected. */
  def convertdimVec(dim: String, xlate: Column => Column, valueCol: String,
                    vecagg: Column => Column, as: String = "value"): NDSparse = {
    val mapped = df.withColumn(dim, xlate(col(dim)))
    val out = mapped.groupBy(dims.map(col): _*)
      .agg(vecagg(array_sort(collect_list(col(valueCol)))).as(as))
    NDSparse(JTable(out, dims), dims, Seq(as))
  }

  /** `selectkeys(x, sel; agg)` — re-key by a subset of index columns
    * (reference `src/selection.jl:25-31`). */
  def selectkeys(newDims: Seq[String], aggs: (String, Column)*): NDSparse = {
    val out = df.groupBy(newDims.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    NDSparse(JTable(out, newDims), newDims, aggs.map(_._1))
  }

  /** `permutedims(t, p)` — reorder index dims; re-establishes the sort
    * (reference `src/sort.jl:70-90`). */
  def permutedims(perm: Seq[Int]): NDSparse = {
    val newDims = perm.map(dims(_))
    NDSparse(JTable(df, newDims), newDims, valueCols)
  }

  /** `broadcast(f, A, B; dimmap)` — N-d array broadcasting: inner join on
    * the shared dims, apply `f` elementwise (reference `src/join.jl:269-335`).
    * Output dims = A's dims followed by B-only dims, like the reference
    * (`src/join.jl:286-322` keeps both sides' non-matched dims — the result
    * indexes over the cross of the unmatched dimensions). The join is
    * planned by Catalyst (broadcast if `other` is small, else sort-merge on
    * shared dims). */
  def broadcastOp(other: NDSparse, f: (Column, Column) => Column,
                  as: String = "value",
                  dimmap: Option[Seq[String]] = None): NDSparse = {
    // dimmap (reference `src/join.jl:286-322`): explicit join-dim subset;
    // dims mapped to 0 in the reference = excluded here by omission.
    val shared = dimmap.getOrElse(dims.filter(other.dims.contains))
    require(shared.nonEmpty, "broadcast requires at least one shared dim")
    require(valueCols.size == 1 && other.valueCols.size == 1,
      s"broadcast combines single-value arrays (got $valueCols vs ${other.valueCols}); " +
        "select one value column per side first (reference broadcast is elementwise on the value)")
    val otherOnly = other.dims.filterNot(shared.contains)
    // a B-only dim whose NAME collides with an A column (possible when
    // dimmap excludes a same-named dim from the join) is disambiguated —
    // the reference's dims are positional so "both sides keep their
    // unmatched dim" can't collide there; here it must be renamed or the
    // joined frame has two identically-named columns
    val rOnlyNames = otherOnly.map { c =>
      // fresh-name loop: the suffixed name must not collide either (A may
      // itself carry a `<dim>_r` column)
      var nm = c
      while (df.columns.contains(nm)) nm += "_r"
      c -> nm
    }
    val r = other.df.select((shared ++ otherOnly ++ other.valueCols).map(col): _*)
      .withColumnsRenamed(
        (other.valueCols.map(c => c -> s"__r_$c") ++
          rOnlyNames.filter { case (a, b) => a != b }).toMap)
    val joined = df.join(r, shared)
    val outDims = dims ++ rOnlyNames.map(_._2)
    val out = joined.select(
      outDims.map(col) :+ f(col(valueCols.head), col(s"__r_${other.valueCols.head}")).as(as): _*)
    NDSparse(JTable(out, outDims), outDims, Seq(as))
  }

  /** `naturaljoin(op, l, r)` — inner join on the full index intersection,
    * values combined by `op` (reference `src/join.jl:138-189`). */
  def naturaljoin(other: NDSparse, op: (Column, Column) => Column,
                  as: String = "value"): NDSparse = broadcastOp(other, op, as)
}

object NDSparse {
  /** `ndsparse(keys, values; agg)` — construction dedups key collisions via
    * `agg` (reference `src/ndsparse.jl:19-23`). */
  def apply(df: DataFrame, dims: Seq[String], valueCols: Seq[String],
            agg: Option[Column => Column] = None): NDSparse = agg match {
    case None => NDSparse(JTable(df, dims), dims, valueCols)
    case Some(a) =>
      val deduped = df.groupBy(dims.map(col): _*)
        .agg(a(col(valueCols.head)).as(valueCols.head),
          valueCols.tail.map(c => a(col(c)).as(c)): _*)
      NDSparse(JTable(deduped, dims), dims, valueCols)
  }
}
