package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query time is the MEDIAN of N runs (default 5; was 3 through
    // round 5): single-run numbers at sub-3-second scales showed a
    // ±10-30% JIT/run-order noise band across rounds, and round-5's
    // driver run showed ±50%+ host-load swings (q09 3.46 s vs 1.0 s on
    // the same code) — the median measures the plan, not the jitter.
    val iters = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt, 1)
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
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var ok = true
      var i = 0
      while (ok && i < iters) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e"); ok = false }
        i += 1
      }
      val median =
        if (!ok) -1.0
        else {
          val s = times.sorted
          if (s.length % 2 == 1) s(s.length / 2)
          else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
        }
      (name, median, ok)
    }.toSeq
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
