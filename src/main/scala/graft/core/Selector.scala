package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType
import scala.util.matching.Regex

/** The reference's selector mini-language (reference `docs/src/basics.md:59-114`,
  * `docs/src/tutorial.md:86-125`) as a small ADT compiled to Spark `Column`s.
  *
  * Supported forms: column position (`Pos`), name (`Name`), `Regex` on names,
  * `OfType` (columns whose Spark `DataType` matches), `Not`, `Between(first,
  * last)`, `Keys` (the pkey columns), `All(...)` union, `Fn(sel, f)` =
  * reference's `sel => fn` mapping form, and `As(sel, name)` renaming.
  *
  * This is a pure API layer: everything lowers to `df.select(columns…)`, so
  * Catalyst still sees plain named projections (column pruning, pushdown all
  * intact).
  */
sealed trait Sel {
  /** Rename the selection (reference's `name => sel` form). */
  def as(name: String): Sel = Sel.As(this, name)
  /** Apply a function over the selection (reference's `sel => fn` pair). */
  def andThen(f: Column => Column): Sel = Sel.Fn(this, f)
}

object Sel {
  final case class Name(name: String) extends Sel
  final case class Pos(i: Int) extends Sel // 1-based like the reference
  final case class Re(re: Regex) extends Sel
  final case class OfType(dt: DataType) extends Sel
  final case class Not(sel: Sel) extends Sel
  final case class Between(first: String, last: String) extends Sel
  case object Keys extends Sel
  case object AllCols extends Sel
  final case class All(sels: Seq[Sel]) extends Sel
  final case class Fn(sel: Sel, f: Column => Column) extends Sel
  final case class As(sel: Sel, name: String) extends Sel
  /** An arbitrary Column expression (Spark-native escape hatch). */
  final case class Expr(c: Column, name: Option[String] = None) extends Sel

  def apply(name: String): Sel = Name(name)
  def apply(i: Int): Sel = Pos(i)
  def apply(re: Regex): Sel = Re(re)

  import scala.language.implicitConversions
  implicit def fromString(s: String): Sel = Name(s)
  implicit def fromInt(i: Int): Sel = Pos(i)
  implicit def fromRegex(r: Regex): Sel = Re(r)
  implicit def fromColumn(c: Column): Sel = Expr(c)

  /** A selector is "plain" when it projects existing columns unchanged
    * (safe for pkey-invariant preservation); Fn/As/Expr may transform or
    * rename, so they are not plain. */
  def isPlain(sel: Sel): Boolean = sel match {
    case Name(_) | Pos(_) | Re(_) | OfType(_) | Between(_, _) | Keys | AllCols => true
    case Not(s) => isPlain(s)
    case All(ss) => ss.forall(isPlain)
    case Fn(_, _) | As(_, _) | Expr(_, _) => false
  }

  /** Resolve a selector to the list of column *names* it denotes (before any
    * Fn/As transformation). Order follows the dataframe's column order for
    * set-like selectors, and the selector's own order for explicit lists.
    */
  def names(df: DataFrame, pkey: Seq[String], sel: Sel): Seq[String] = sel match {
    case Name(n)   => Seq(n)
    case Pos(i)    => Seq(df.columns(i - 1))
    case Re(re)    => df.columns.toSeq.filter(c => re.findFirstIn(c).isDefined)
    case OfType(dt)=> df.schema.fields.toSeq.filter(_.dataType == dt).map(_.name)
    case Not(s)    => val drop = names(df, pkey, s).toSet; df.columns.toSeq.filterNot(drop)
    case Between(f, l) =>
      val cs = df.columns.toSeq
      val (i, j) = (cs.indexOf(f), cs.indexOf(l))
      require(i >= 0 && j >= i, s"Between($f,$l) out of order or absent")
      cs.slice(i, j + 1)
    case Keys      => pkey
    case AllCols   => df.columns.toSeq
    case All(ss)   => ss.flatMap(names(df, pkey, _)).distinct
    case Fn(s, _)  => names(df, pkey, s)
    case As(s, n)  => Seq(n)
    case Expr(c, n)=> Seq(n.getOrElse(c.toString))
  }

  /** Compile a selector to Spark Columns. */
  def compile(df: DataFrame, pkey: Seq[String], sel: Sel): Seq[Column] = sel match {
    case Name(n)    => Seq(col(n))
    case Pos(i)     => Seq(col(df.columns(i - 1)))
    case Re(_) | OfType(_) | Not(_) | Between(_, _) | Keys | AllCols =>
      names(df, pkey, sel).map(col)
    case All(ss)    => ss.flatMap(compile(df, pkey, _))
    case Fn(s, f)   =>
      val inner = compile(df, pkey, s)
      require(inner.size == 1 || inner.nonEmpty, "Fn selector needs at least one column")
      // reference semantics: fn applied to the (single or tuple) selection
      if (inner.size == 1) Seq(f(inner.head))
      else Seq(f(org.apache.spark.sql.functions.struct(inner: _*)))
    case As(s, n)   =>
      val inner = compile(df, pkey, s)
      require(inner.size == 1, s"As($n) needs a single-column selection")
      Seq(inner.head.as(n))
    case Expr(c, n) => Seq(n.map(c.as).getOrElse(c))
  }
}
