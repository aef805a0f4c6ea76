package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed escape hatches for the reference's arbitrary-function surface
  * (§2.10): `groupby` with an opaque vector function (+`flatten=true` =
  * table-returning UDTF, `test/test_query.jl:116-118`) and `mapslices`
  * returning tables (`src/flatten.jl:1-26`).
  *
  * These are the (d)-tier of the preference order — used only when the
  * function genuinely can't be a Column expression. Each group's rows are
  * materialized in executor memory (the reference has the identical
  * contract: it passes the group's vector to the user function).
  */
object TypedOps {

  /** `groupby(f, t, by)` with an opaque per-group function. */
  def groupbyVector[T, K: Encoder, U: Encoder](ds: Dataset[T], key: T => K)
                                              (f: (K, Seq[T]) => U): Dataset[U] =
    ds.groupByKey(key).mapGroups((k, it) => f(k, it.toSeq))

  /** `groupby(f, t, by; flatten=true)` — table-returning group function
    * (the reference's window-function idiom). */
  def groupbyFlatten[T, K: Encoder, U: Encoder](ds: Dataset[T], key: T => K)
                                               (f: (K, Seq[T]) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(key).flatMapGroups((k, it) => f(k, it.toSeq).iterator)

  /** `mapslices(f, x; dims)` — f over each slice along the iterated dims,
    * may expand rows (cartesian with the slice key). */
  def mapslices[T, K: Encoder, U: Encoder](ds: Dataset[T], sliceKey: T => K)
                                          (f: (K, Seq[T]) => IterableOnce[U]): Dataset[U] =
    groupbyFlatten(ds, sliceKey)(f)
}
