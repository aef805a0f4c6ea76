package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs0 = SparkEntry.queries
    // JVM/codegen warmup so headline numbers measure the engine, not JIT.
    try { qs0(SparkEntry.benchQueries.head)(spark, sfDir).count() }
    catch { case _: Throwable => }
    // a crashing query is flagged (value -1, listed in "errors") instead of
    // silently folding its time-to-crash into the headline total
    val results = SparkEntry.benchQueries.map { name =>
      val fn = qs0(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }.toSeq
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
