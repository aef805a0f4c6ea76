package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the graft-native expressions: register
  * `minhash_sig(text, n, k)`, `simhash64(text)`, `shingle_hashes(text, n)`,
  * `rhp_signature(vec, dim, bits, seed)` so `spark.sql(...)` users get the
  * same operators as the Column API.
  *
  * Two entry points:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (cluster-wide, applied at session build);
  *  - `registerAll(spark)` for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {
  private def intLit(e: Expression): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"expected an integer literal argument, got: $other")
      }
    case other => throw new IllegalArgumentException(
      s"expected a literal argument, got expression: ${other.sql}")
  }

  private[plans] val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> { args =>
      require(args.length == 3, "minhash_sig(text, n, k)")
      MinHashSig(args(0), intLit(args(1)), intLit(args(2)))
    },
    "simhash64" -> { args =>
      require(args.length == 1, "simhash64(text)")
      SimHash64(args(0))
    },
    "normalize_ws" -> { args =>
      require(args.length == 1, "normalize_ws(text)")
      NormalizeWs(args(0))
    },
    "fold_accents" -> { args =>
      require(args.length == 1, "fold_accents(text)")
      FoldAccents(args(0))
    },
    "shingle_hashes" -> { args =>
      require(args.length == 2, "shingle_hashes(text, n)")
      ShingleHashes(args(0), intLit(args(1)))
    },
    "shingle_strings" -> { args =>
      require(args.length == 2, "shingle_strings(text, n)")
      ShingleStrings(args(0), intLit(args(1)))
    },
    "rhp_signature" -> { args =>
      require(args.length == 4, "rhp_signature(vec, dim, bits, seed)")
      RhpSignature(args(0), intLit(args(1)), intLit(args(2)), intLit(args(3)))
    },
    "rep_stats" -> { args =>
      require(args.length == 2, "rep_stats(text, n)")
      RepStats(args(0), intLit(args(1)))
    })

  /** Register on a live session (temp functions, session-scoped). */
  def registerAll(spark: SparkSession): Unit =
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
