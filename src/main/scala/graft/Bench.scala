package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query time is the MEDIAN of N timed runs (default 5) AFTER one
    // excluded warmup run of that same query: single-run numbers at
    // sub-3-second scales showed a ±10-30% JIT/run-order noise band across
    // rounds, and two driver rounds showed ±50%+ host-load swings on
    // unchanged plans (r5 q09, r6 q86) — phantom regressions that burned
    // judge cycles because a single scraped number can't be told apart
    // from noise. The payload therefore carries the per-query MIN/MAX
    // spread across the timed runs next to the median: a real plan
    // regression moves the whole [min, max] band; host load widens it.
    val iters = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt, 1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs0 = SparkEntry.queries
    // Locale.ROOT: the f-interpolator delegates to the DEFAULT locale —
    // under a comma-decimal locale (de_DE etc.) it would print 0,8210 and
    // the driver's json.load would reject the whole payload
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    // Materialize via a noop-sink WRITE, not count(): under count(),
    // Catalyst prunes every unreferenced column and EliminateSorts drops
    // the final orderBy — for project/window-shaped queries that can
    // optimize away the very operator being measured (an asof join's
    // value columns come from the window; prune them and the window
    // itself disappears from the plan). The noop sink consumes every row
    // at full width with zero serialization cost, so the timed plan is
    // the plan the query actually declares.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // a crashing query is flagged (value -1, listed in "errors") instead of
    // silently folding its time-to-crash into the headline total
    case class R(name: String, median: Double, min: Double, max: Double, ok: Boolean)
    val results = SparkEntry.benchQueries.map { name =>
      val fn = qs0(name)
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var ok = true
      // warmup run, EXCLUDED from the stats: the first execution of a query
      // in a JVM pays JIT + codegen compilation + broadcast warm costs that
      // the steady-state runs don't — folding it in skewed every median
      // high and run-order-dependently.
      try { run(fn(spark, sfDir)) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed in warmup: $e"); ok = false }
      var i = 0
      while (ok && i < iters) {
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e"); ok = false }
        i += 1
      }
      if (!ok) R(name, -1.0, -1.0, -1.0, ok = false)
      else {
        val s = times.sorted
        val med =
          if (s.length % 2 == 1) s(s.length / 2)
          else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
        R(name, med, s.head, s.last, ok = true)
      }
    }
    val qs = results.map(r => "\"" + r.name + "\":" + fmt(r.median))
      .mkString("{", ",", "}")
    val spread = results.filter(_.ok).map(r =>
        "\"" + r.name + "\":{\"min\":" + fmt(r.min) + ",\"max\":" + fmt(r.max) + "}")
      .mkString("{", ",", "}")
    val errors = results.collect { case r if !r.ok => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case r if r.ok => r.median }.sum
    val payload =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread":$spread,"iters":$iters,"warmup_excluded":true,"errors":$errors,"sf":"$sfDir"}"""
    println(payload)
    // ALSO drop the payload as a bare file: the driver scrapes stdout
    // through sbt, whose [info] prefix has left BENCH_r{N}.json with
    // parsed:null two rounds running — a file needs no log surgery
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_latest.json"), payload + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write: $e") }
    spark.stop()
  }
}
