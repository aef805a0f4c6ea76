package graft

import org.apache.spark.sql.types._

/** Registry-wide FLAT-OUTPUT lint — the driver-gate contract the q199
  * incident exposed (round 11's only non-green row): the driver's
  * correctness harness compares Spark vs DuckDB results through a pandas
  * `sort_values` + hash, which CRASHES on nested cells (`unhashable
  * type: numpy.ndarray`). So every registry query's OUTPUT schema must
  * be atomic columns only — no Array, Map, or Struct. Nested payloads
  * (sketches, projected vectors, centroid lists) must be reduced to
  * scalars (or exploded to one row per element, q199's fix) BEFORE the
  * query returns.
  *
  * The check reads `.schema`, which for most queries is plan
  * construction only — but a handful of registry entries are EAGER
  * (they collect a sketch or drive a MemoryStream to build their
  * result, e.g. q225/q232/q249), so building their DataFrame executes
  * real work at sf0.001. The lint therefore costs a small sf0.001 run,
  * not zero; in exchange it covers every query including the eager ones
  * and fails with the full list of offending (query, column, type)
  * triples — the lint a new batch hits at `sbt test` time instead of at
  * the next round's driver gate.
  */
class FlatOutputSpec extends SparkSpec {

  private def isAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  test("every registry query emits only atomic (driver-hashable) columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf).schema
          catch { case e: Throwable =>
            fail(s"$name failed to build at sf0.001: ${e.getMessage}", e)
          }
        schema.fields.collect {
          case f if !isAtomic(f.dataType) => (name, f.name, f.dataType.sql)
        }
    }
    assert(offenders.isEmpty,
      s"nested output columns break the driver's pandas oracle compare:\n" +
        offenders.map { case (q, c, t) => s"  $q.$c: $t" }.mkString("\n"))
  }
}
