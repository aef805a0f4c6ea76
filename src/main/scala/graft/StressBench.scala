package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 scale-knob stress bench: measures each skew/size knob in the
  * regime it exists FOR, on a derived fixture with a genuinely hot key —
  * the regime the sf0.1 fixtures never reach (there, the plain forms win
  * and every crossover claim was reasoning; see NOTES_r7). Run manually:
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.StressBench"
  *
  * Fixture (built once into /tmp/graft_stress, ~600 MB):
  *  - docs_stress: sf0.1 documents × 10 replicas, every token re-hashed
  *    per replica (so replicas share no shingles — background shingle
  *    df ≈ 1 and the measured contrast is attributable to the planted
  *    key, not replication artifacts), plus a 3-token hot sentence
  *    appended to 10% of docs → one shingle with df = 5,000 whose
  *    uncapped pair volume is C(5000,2) ≈ 12.5M rows.
  *  - events_stress: sf0.1 events × 100 (10M rows, ts jittered per
  *    replica to stay distinct), with 50% of ALL rows folded onto
  *    user_id 0 — the single-window-task funnel asofJoinSalted exists
  *    for.
  *
  * Measurements (median + min/max over N timed iters after one excluded
  * warmup, noop-sink materialization — same discipline as Bench):
  *  - jaccard capped (maxDF=100) vs uncapped on the hot corpus
  *  - capped jaccard under SHUFFLE_HASH vs forced-broadcast build
  *  - asofJoin plain vs salted on the hot-user event stream
  *  - connectedComponents driver union-find vs distributed label
  *    propagation on a 4M-edge graph just inside the 5M fast-path gate
  *    (571k chain components of diameter 7 — the iterative path pays
  *    ~8 join+aggregate rounds; the gate's justification measured, not
  *    argued)
  *  - minhashLSH signature sharing vs recompute-per-join-side (the
  *    ReuseExchange gap): the k-hash pass dominates at corpus scale
  * Emits one JSON line (stdout + target/stress_latest.json) for
  * NOTES/SCALE tables. */
object StressBench {

  private val root = "/tmp/graft_stress"

  private def buildFixtures(spark: SparkSession, sfDir: String): Unit = {
    val fs = java.nio.file.Paths.get(root)
    val t0 = System.nanoTime()
    if (!java.nio.file.Files.exists(fs.resolve("docs_stress/_SUCCESS"))) {
      val docs = Tables.documents(spark, sfDir)
      val reps = explode(sequence(lit(0), lit(9))).as("rep")
      // per-replica token re-hash: xxhash64(token, rep) rendered to hex —
      // cheap, deterministic, and shingle-disjoint across replicas
      val stressDocs = docs.select(col("doc_id"), col("text"), reps)
        .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            t => hex(xxhash64(t, col("rep"))))).as("text"))
        .withColumn("text",
          when(pmod(col("doc_id"), lit(10)) === 0,
            concat(col("text"), lit(" hotaa hotbb hotcc"))).otherwise(col("text")))
      stressDocs.repartition(32).write.mode("overwrite").parquet(s"$root/docs_stress")
    }
    if (!java.nio.file.Files.exists(fs.resolve("events_stress/_SUCCESS"))) {
      // 100 replicas (10M rows), HALF of all rows folded onto user 0: the
      // hot window partition is ~2.8M rows (purchases+clicks of user 0) —
      // deep enough that one task's sort dominates the plain operator's
      // wall clock on 32 cores (at 25%/5M rows the salt overhead and the
      // skew cancelled: plain 1.44 vs salted 1.54 — measured, kept in
      // NOTES_r8 as the crossover's other side)
      val ev = Tables.events(spark, sfDir)
      val evReps = explode(sequence(lit(0), lit(99))).as("rep")
      val stressEv = ev.select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"), evReps)
        .select((col("event_id") * 100 + col("rep")).as("event_id"),
          when(pmod(col("event_id") * 100 + col("rep"), lit(2)) === 0, lit(0L))
            .otherwise(col("user_id") + 1).as("user_id"),
          (col("ts") + col("rep")).as("ts"), col("event_type"), col("value"))
      stressEv.repartition(32).write.mode("overwrite").parquet(s"$root/events_stress")
    }
    if (!java.nio.file.Files.exists(fs.resolve("edges_stress/_SUCCESS"))) {
      // 4M edges just inside the 5M driver-union-find gate: 8-node chain
      // blocks (7 edges each, diameter 7), so the distributed path pays
      // the full O(diameter) round count while the driver path is one
      // collect + one linear pass — the regime the gate exists for
      val edges = spark.range(4000000L)
        .select(((col("id") / 7).cast("long") * 8 + pmod(col("id"), lit(7))).as("i"))
        .select(col("i"), (col("i") + 1).as("j"))
      edges.repartition(32).write.mode("overwrite").parquet(s"$root/edges_stress")
    }
    System.err.println(f"[stress] fixtures ready in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt, 1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // deliberately NO autoBroadcastJoinThreshold override: broadcast
      // HINTS are honored regardless of the threshold (and the 8 GB cap
      // is hardcoded in BroadcastExchangeExec), while raising it would
      // silently change the UN-hinted joins inside the operators (e.g.
      // the maxDF cap's anti-join side) across every arm — the plans
      // must be the production-default plans the comparison is about
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildFixtures(spark, sfDir)

    val docs = spark.read.parquet(s"$root/docs_stress")
    val events = spark.read.parquet(s"$root/events_stress")
    val l = events.filter(col("event_type") === "purchase")
    val r = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))

    import graft.functions.Dedup
    import graft.operators.Joins
    def jaccard(maxDF: Long, strategy: String): DataFrame =
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8,
        maxDF = maxDF, hashShingles = true, joinStrategy = strategy)
    val cases: Seq[(String, () => DataFrame)] = Seq(
      "jaccard_capped" -> (() => jaccard(100, "shuffle_hash")),
      "jaccard_uncapped" -> (() => jaccard(0, "shuffle_hash")),
      "jaccard_capped_broadcast" -> (() => jaccard(100, "broadcast")),
      "jaccard_uncapped_broadcast" -> (() => jaccard(0, "broadcast")),
      "asof_plain" -> (() => Joins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
        lCols = Seq("event_id", "value"), rValueCols = Seq("click_id", "click_value"))),
      "asof_salted" -> (() => Joins.asofJoinSalted(l, r, Seq("user_id"), "ts", "ts",
        lCols = Seq("event_id", "value"), rValueCols = Seq("click_id", "click_value"),
        // 1h buckets in ns: ~720 buckets over the 30-day span → the hot
        // user's 1.25M rows split into ~1.7k-row window tasks
        bucketOf = t => (t / lit(3600000000000L)).cast("long"))),
      "cc_driver" -> (() => Dedup.connectedComponents(
        spark.read.parquet(s"$root/edges_stress"))),
      "cc_distributed" -> (() => Dedup.connectedComponents(
        spark.read.parquet(s"$root/edges_stress"), localEdgeLimit = 0L)),
      // the signature-sharing knob in ITS regime: the k-hash pass over the
      // 50k-doc stress corpus (sf0.1 docs ×10) dominates, so computing it once (lazy
      // localCheckpoint) beats the recompute-per-join-side plan that
      // ReuseExchange fails to rescue (subtrees canonicalize unequal)
      "minhash_shared" -> (() => Dedup.minhashLSH(docs, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 8, minEstSim = 0.8)),
      "minhash_recompute" -> (() => Dedup.minhashLSH(docs, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 8, minEstSim = 0.8,
        shareSignatures = false)))

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val results = cases.map { case (name, mk) =>
      run(mk()) // warmup, excluded
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); run(mk()); (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = if (times.length % 2 == 1) times(times.length / 2)
        else (times(times.length / 2 - 1) + times(times.length / 2)) / 2.0
      System.err.println(f"[stress] $name%-26s median ${med}%7.2f s  " +
        f"[${times.head}%.2f, ${times.last}%.2f]")
      (name, med, times.head, times.last)
    }
    val payload = results.map { case (n, m, lo, hi) =>
      s""""$n":{"median":${fmt(m)},"min":${fmt(lo)},"max":${fmt(hi)}}"""
    }.mkString("{\"stress\":{", ",", s"},\"iters\":$iters,\"sf\":\"$sfDir\"}")
    println(payload)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/stress_latest.json"), payload + "\n")
    catch { case e: Throwable => System.err.println(s"[stress] file write: $e") }
    spark.stop()
  }
}
