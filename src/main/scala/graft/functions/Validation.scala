package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint-check suite a
  * 100 TB ingest runs before publishing a table: row predicates, key
  * uniqueness, and referential integrity, each reported as a violation
  * count. (Reference anchor: the reference validates primary-key
  * sortedness/uniqueness at table construction, src/table.jl — this
  * generalizes that gate into a user-declared rule set.)
  */
object Validation {

  sealed trait Rule { def name: String }
  /** Rows where `cond` is NOT true (null counts as a violation). */
  final case class Check(name: String, cond: Column) extends Rule
  /** Rows belonging to a (cols)-group with more than one member. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Rows whose (cols) tuple has no match in `ref`(refCols). */
  final case class ForeignKey(name: String, cols: Seq[String],
                              ref: DataFrame, refCols: Seq[String]) extends Rule

  /** Evaluate every rule; returns (rule, n_violations) — one row per
    * rule, in declaration order (a `rule_id` column keeps the order
    * stable for deterministic output).
    *
    * Cost shape: ALL `Check` rules ride ONE aggregate pass over the
    * table (a count(when(¬cond)) per rule in a single agg — the scan is
    * paid once no matter how many predicates); each `Unique` is one
    * map-side-combined aggregate on its key; each `ForeignKey` is one
    * left-anti join (broadcast when the reference's key side is small).
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val spark = df.sparkSession
    import spark.implicits._
    val checks = rules.collect { case c: Check => c }
    val checkCounts: Map[String, DataFrame] =
      if (checks.isEmpty) Map.empty
      else {
        val agged = df.agg(
          count(when(!coalesce(checks.head.cond, lit(false)), 1)).as(checks.head.name),
          checks.tail.map(c =>
            count(when(!coalesce(c.cond, lit(false)), 1)).as(c.name)): _*)
        checks.map(c => c.name ->
          agged.select(lit(c.name).as("rule"), col(c.name).as("n_violations"))).toMap
      }
    val perRule: Seq[DataFrame] = rules.map {
      case c: Check => checkCounts(c.name)
      case u: Unique =>
        df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1L)
          .agg(coalesce(sum(col("__n")), lit(0L)).as("n_violations"))
          .select(lit(u.name).as("rule"), col("n_violations"))
      case f: ForeignKey =>
        val refKeys = f.ref.select(f.refCols.map(col): _*).distinct()
          .toDF(f.cols: _*)
        df.select(f.cols.map(col): _*)
          .join(refKeys, f.cols, "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(f.name).as("rule"), col("n_violations"))
    }
    perRule.zipWithIndex
      .map { case (d, i) => d.withColumn("rule_id", lit(i.toLong)) }
      .reduce(_ unionByName _)
      .select(col("rule_id"), col("rule"), col("n_violations").cast("long"))
  }
}
