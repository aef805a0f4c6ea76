package graft.operators

import graft.core.JTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshape surface (reference §2.11: `stack`, `unstack`, `flatten`,
  * `mapslices`). All lower to narrow generators (`stack` expression,
  * `explode`) or one pivot shuffle — no driver-side collection, so each
  * scales linearly with input.
  */
object Reshape {

  /** `stack(t, by; select, variable, value)` — wide→long melt (reference
    * `src/reshape.jl:1-9`). Lowered to the codegen'd `stack` expression:
    * a narrow op, output = |rows| × |cols| with no shuffle. */
  def stack(t: JTable, idCols: Seq[String], valueCols: Seq[String],
            variable: String = "variable", value: String = "value"): DataFrame = {
    val numeric = valueCols.forall(c =>
      t.df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    require(numeric,
      s"stack value columns must all be numeric (got ${valueCols.map(c => t.df.schema(c).dataType)}); " +
        "a heterogeneous melt would silently null non-numeric cells")
    require((valueCols ++ Seq(variable, value)).forall(n => !n.contains("`") && !n.contains("'")),
      "stack column/output names must not contain quotes")
    val arms = valueCols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    t.df.select(
      idCols.map(col) :+
        expr(s"stack(${valueCols.size}, $arms) as (`$variable`, `$value`)"): _*)
  }

  /** `unstack(t, by; variable, value)` — long→wide pivot (reference
    * `src/reshape.jl:11-26`). With explicit `pivotValues` the plan is a
    * single groupBy shuffle (no distinct-values pre-pass — at 100 TB the
    * two-pass dynamic pivot doubles the scan, so callers should pass the
    * domain when they know it, exactly like the reference's collected
    * `unique` set).
    *
    * Default cell aggregate is `min` — deterministic when multiple rows
    * share (by, variable), and identical to the reference's single-value
    * pick when the pair is unique (Spark's `first` is arrival-order
    * nondeterministic; a run-to-run divergence trap). Pass `agg`
    * explicitly for other collision semantics. */
  def unstack(t: JTable, by: Seq[String], variable: String, value: String,
              pivotValues: Seq[String] = Nil, agg: Column => Column = min(_)): DataFrame = {
    val g = t.df.groupBy(by.map(col): _*)
    val p = if (pivotValues.nonEmpty) g.pivot(variable, pivotValues) else g.pivot(variable)
    p.agg(agg(col(value)))
  }

  /** `flatten(t, col)` — explode a vector-valued column (reference
    * `src/flatten.jl:28-30`). `posexplode` keeps the element index so
    * results stay deterministic and array order is preserved. */
  def flatten(t: JTable, arrayCol: String, keep: Seq[String],
              posName: String = "pos", elemName: String = "elem"): DataFrame =
    t.df.select(keep.map(col) :+ posexplode(col(arrayCol)).as(Seq(posName, elemName)): _*)

  /** Table-valued-cell flatten: explode an array-of-struct column then
    * splat the struct fields (reference `test/test_query.jl:113-114`). */
  def flattenStructs(t: JTable, arrayCol: String, keep: Seq[String]): DataFrame = {
    val exploded = t.df.select(keep.map(col) :+ explode(col(arrayCol)).as("__s"): _*)
    exploded.select(keep.map(col) :+ col("__s.*"): _*)
  }

  /** `mapslices(f, x, dims)` (reference `src/flatten.jl:1-26`): apply a
    * slice-wise function along the trailing dims. Expressible slice
    * functions should use window expressions (this fast path); opaque
    * ones go through groupByKey.flatMapGroups on the leading dims. */
  def mapslicesExpr(t: JTable, iterDims: Seq[String], exprs: Seq[Column]): DataFrame =
    t.df.select(iterDims.map(col) ++ exprs: _*)
}
