package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Extract per-query medians from a prior-round bench artifact.
   *
   *  Handles the three shapes seen in real driver artifacts: (a) the bare
   *  one-line payload this program prints ({"queries":{...}}), (b) the
   *  driver wrapper with a "parsed" copy of the payload, and (c) the
   *  driver wrapper where parsing failed (parsed:null) and only an
   *  escaped, possibly front-truncated "tail" string survives — BENCH_r08
   *  is shape (c), which is exactly why this uses a real JSON parser for
   *  the wrapper and a name:number regex over the decoded tail. Spread
   *  ({"min":..}) and sanity-flag entries are objects, not numbers, so
   *  the regex cannot confuse them with medians.
   *
   *  Round-14 fix (r13 Wrong #4): as the registry grew, the driver's
   *  tail-truncated copy lost the ENTIRE "queries" map (it prints before
   *  the spread) and the sanity compare fell 23 → 9 → 0 lines. The
   *  payload now duplicates each median as "med" INSIDE its spread entry
   *  — the spread is printed last, so it survives front-truncation — and
   *  this reader falls back to those (JSON field or a med-regex over the
   *  tail) when the queries map is gone. */
  private[graft] def priorMedians(txt: String): Map[String, Double] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
    def fromPayload(j: JValue): Map[String, Double] = {
      val direct = j \ "queries" match {
        case JObject(fs) => fs.flatMap { case (n, v) => num(v).map(n -> _) }.toMap
        case _ => Map.empty[String, Double]
      }
      if (direct.nonEmpty) direct
      else j \ "spread" match {
        case JObject(fs) =>
          fs.flatMap { case (n, o) => num(o \ "med").map(n -> _) }.toMap
        case _ => Map.empty
      }
    }
    def fromText(s: String): Map[String, Double] = {
      // spread "med" entries FIRST (round 20): the payload now carries a
      // task_time map between queries and spread, and on a
      // front-truncated tail the bare name:number regex would read its
      // entries as medians — the med harvest is unambiguous, so it takes
      // precedence and the regex only fills names the spread lost
      val acc = scala.collection.mutable.Map.empty[String, Double]
      spreadField(s, "med").foreach { case (n, v) => acc(n) = v }
      val prx = java.util.regex.Pattern.compile("\"(q[^\"]+)\":(-?[0-9.]+)")
      val m = prx.matcher(s)
      while (m.find()) if (!acc.contains(m.group(1))) acc(m.group(1)) = m.group(2).toDouble
      acc.toMap
    }
    val j = try JsonMethods.parse(txt) catch { case _: Throwable => org.json4s.JNothing }
    val direct = fromPayload(j)
    if (direct.nonEmpty) direct
    else {
      val parsed = fromPayload(j \ "parsed")
      if (parsed.nonEmpty) parsed
      else j \ "tail" match {
        case JString(tail) => fromText(tail)
        case _ => fromText(txt)
      }
    }
  }

  /** `"qname":{… "<field>":N …}` harvest over raw text — spread-entry
    * mining for both the med fallback above and the min-band fallback
    * below. */
  private def spreadField(s: String, field: String): Map[String, Double] = {
    val rx = java.util.regex.Pattern
      .compile("\"(q[^\"]+)\":\\{[^}]*\"" + field + "\":(-?[0-9.]+)")
    val m = rx.matcher(s)
    val acc = scala.collection.mutable.Map.empty[String, Double]
    while (m.find()) if (!acc.contains(m.group(1))) acc(m.group(1)) = m.group(2).toDouble
    acc.toMap
  }

  /** Prior per-query MIN bands — the fallback basis for the sanity
    * compare against pre-round-14 artifacts, whose truncated tails kept
    * only {"min","max"} spread entries (no medians survive). Min is the
    * band the r13 judge anchored on: tight and host-load-resistant. */
  private[graft] def priorMins(txt: String): Map[String, Double] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = try JsonMethods.parse(txt) catch { case _: Throwable => org.json4s.JNothing }
    def fromSpread(j: JValue): Map[String, Double] = j \ "spread" match {
      case JObject(fs) => fs.flatMap { case (n, o) => o \ "min" match {
        case JDouble(d) => Some(n -> d)
        case JInt(i) => Some(n -> i.toDouble)
        case JDecimal(d) => Some(n -> d.toDouble)
        case _ => None
      } }.toMap
      case _ => Map.empty
    }
    val direct = fromSpread(j)
    if (direct.nonEmpty) direct
    else {
      val parsed = fromSpread(j \ "parsed")
      if (parsed.nonEmpty) parsed
      else j \ "tail" match {
        case JString(tail) => spreadField(tail, "min")
        case _ => spreadField(txt, "min")
      }
    }
  }

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
    //
    // ROUND-ROBIN PASSES (round 9): iterations are interleaved ACROSS
    // queries — pass 1 runs q01..qN once, pass 2 runs q01..qN again, … —
    // instead of running each query's 5 iterations back-to-back. Round 8
    // showed why: a multi-second host-load burst that covers one query's
    // whole contiguous 5-iteration window moves that line's ENTIRE
    // [min,max] band (driver r8 read q108 at 1.53 s; a same-HEAD re-run
    // measured 0.42 s — the burst swallowed every sample of one line and
    // the band defense designed for exactly this was defeated). With
    // interleaving the same burst lands on ONE sample of MANY queries:
    // each median-of-5 discards it, no single line's band jumps.
    val iters = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt, 1)
    // Deliberate-noise harness test (NOT used by the driver): burn all
    // cores for BURN_SECS starting at the top of pass K to verify the
    // interleaving claim — see NOTES_r9. The burst is bounded-duration
    // (default 8 s, the magnitude of the r8 q108 artifact: a host burst
    // covering one query's ~5 contiguous sub-second iterations), NOT
    // pass-length: saturating every core for a whole 15 s pass triggers
    // host frequency scaling whose residue bleeds into the NEXT passes —
    // a much bigger event than the artifact being simulated, and one no
    // iteration ordering could absorb. -1 = off.
    val burnPass = sys.env.getOrElse("SPARK_GRAFT_BENCH_BURN_PASS", "-1").toInt
    val burnSecs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BURN_SECS", "8").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Codegen-class cache sized for the suite (static conf, default
      // 100 entries): 26 interleaved queries hold far more than 100
      // generated classes, so at the default every pass RE-COMPILES
      // every stage through Janino and the bench measures compilation,
      // not execution — a pure artifact of round-robin ordering
      // (measured on one host, minutes apart, at local[32] sf0.1:
      // back-to-back r8 method 17.96 s; interleaved at default cache
      // 24.47 s; interleaved with this setting ~r8 level — see
      // NOTES_r9). Production sessions run plans warm (a 100 TB query's
      // codegen is amortized over minutes, and long-lived sessions can
      // set this conf); the bench must not charge Janino per iteration.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
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
    // Focused A/B runs (round 18): SPARK_GRAFT_BENCH_ONLY=q90_...,q179_...
    // restricts the headline set — the per-line regression-pinning
    // protocol (suspect lines re-measured back-to-back at HEAD against
    // a prior round's committed band) without paying the full suite per
    // arm. NOT used by the driver (its artifacts always carry the full
    // set); the interleaving + median logic is unchanged.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // CANARY (round 19, VERDICT r18 Next #1): one fixed-plan synthetic
    // line reported alongside every run — a seeded integer range →
    // codegen'd arithmetic → one aggregate. No parquet, no library
    // code, no shuffle wider than the partial/final agg; the plan can
    // never change across rounds, so whole-set drift separates into
    // measured host noise (the canary moved too) vs a real regression
    // (the set moved, the canary didn't). Deliberately NOT in
    // SparkEntry.benchQueries (it is not a registry/headline query —
    // PlanBudgetSpec probes those) and excluded from the >2x sanity
    // flags' prior lookup only by never having a prior to flag against
    // in rounds before it existed.
    val canaryName = "q00_canary_fixedplan"
    def canary(s: SparkSession): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      s.range(0L, 200000000L, 1L, cpus.toInt)
        .select((((col("id") * 2654435761L) % 1000000007L)
          .bitwiseXOR(shiftright(col("id"), 7))).as("x"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    }
    val qsAll = qs0 ++ Map(canaryName ->
      ((s: SparkSession, _: String) => canary(s)))
    // Per-line executor TASK-TIME next to wall (round 20, VERDICT r19
    // Next #8): a SparkListener sums executorRunTime per stage, mapped
    // to the owning query via the job description set before each
    // TIMED run (guide §1.5; warmup runs carry no description and are
    // excluded, like their wall times). Driver-bound lines
    // (wall ≫ task_time/cores) now separate from data-bound ones
    // mechanically — the scaling block's ≈1 ratios at lower core
    // counts are the expected signature of a driver-bound line, not a
    // harness bug. Purely additive payload field.
    val taskTimeMs = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val stageOwner = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        val desc = Option(ss.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        if (desc.nonEmpty) stageOwner.put(ss.stageInfo.stageId, desc)
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val owner = stageOwner.get(te.stageId)
        if (owner != null && te.taskMetrics != null) {
          taskTimeMs.merge(owner,
            java.lang.Long.valueOf(te.taskMetrics.executorRunTime),
            (a, b) => java.lang.Long.valueOf(a + b))
        }
      }
    })
    val names = (canaryName +: SparkEntry.benchQueries)
      .filter(n => only.forall(_.contains(n)))
    val times = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    val ok = scala.collection.mutable.Map.empty[String, Boolean]
    names.foreach { n => times(n) = scala.collection.mutable.ArrayBuffer.empty[Double]; ok(n) = true }
    // Warmup pass, EXCLUDED from the stats: the first execution of a query
    // in a JVM pays JIT + codegen compilation + broadcast warm costs that
    // the steady-state runs don't — folding it in skewed every median
    // high and run-order-dependently. A query that crashes here is flagged
    // (value -1, listed in "errors") instead of silently folding its
    // time-to-crash into the headline total.
    names.foreach { name =>
      try { run(qsAll(name)(spark, sfDir)) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed in warmup: $e"); ok(name) = false }
    }
    var pass = 0
    while (pass < iters) {
      val p0 = System.nanoTime()
      if (pass == burnPass) {
        val deadline = System.nanoTime() + (burnSecs * 1e9).toLong
        (0 until Runtime.getRuntime.availableProcessors()).foreach { _ =>
          val t = new Thread(() => {
            var x = 0L; while (System.nanoTime() < deadline) { x += 1 }; if (x == -1) println(x)
          })
          t.setDaemon(true); t.start()
        }
        System.err.println(s"[bench] injected $burnSecs s all-core burn at top of pass $pass")
      }
      names.foreach { name =>
        if (ok(name)) {
          spark.sparkContext.setJobDescription(name)
          val t0 = System.nanoTime()
          try { run(qsAll(name)(spark, sfDir)); times(name) += (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e"); ok(name) = false }
          finally spark.sparkContext.setJobDescription(null)
        }
      }
      if (burnPass >= 0)
        System.err.println(f"[bench] pass $pass: ${(System.nanoTime() - p0) / 1e9}%.1f s")
      pass += 1
    }
    case class R(name: String, median: Double, min: Double, max: Double, ok: Boolean)
    val results = names.map { name =>
      if (!ok(name) || times(name).isEmpty) R(name, -1.0, -1.0, -1.0, ok = false)
      else {
        val s = times(name).sorted
        val med =
          if (s.length % 2 == 1) s(s.length / 2)
          else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
        R(name, med, s.head, s.last, ok = true)
      }
    }
    // Cross-round sanity: compare each median against the newest committed
    // BENCH_r{N}.json in the working directory and flag >2x moves in either
    // direction. A flag does NOT fail the bench — the r8 lesson is that a
    // 5x one-line move on unchanged code needed a human re-run to
    // adjudicate; this field makes such lines self-announcing so nobody
    // anchors a round's conclusions on a burst artifact.
    val sanity: String = {
      try {
        val cwd = java.nio.file.Paths.get(".")
        val rx = java.util.regex.Pattern.compile("BENCH_r(\\d+)\\.json")
        val prior = java.nio.file.Files.list(cwd).toArray.toSeq
          .map(_.toString.stripPrefix("./"))
          .flatMap { f => val m = rx.matcher(f); if (m.matches()) Some((m.group(1).toInt, f)) else None }
          .sortBy(-_._1).headOption
        prior match {
          case None => "null"
          case Some((rn, file)) =>
            val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(file))
            // medians when the prior artifact carries them (round 14+
            // spread "med" survives truncation); else fall back to
            // min-vs-min bands — the only numbers pre-r14 tails kept
            val prevMed = priorMedians(txt)
            val (prev, basis, cur) =
              if (prevMed.nonEmpty)
                (prevMed, "median", (r: R) => r.median)
              else (priorMins(txt), "min", (r: R) => r.min)
            val flags = results.filter(_.ok).flatMap { r =>
              prev.get(r.name) match {
                case Some(p) if p > 0 && (cur(r) > 2 * p || cur(r) * 2 < p) =>
                  Some("\"" + r.name + "\":{\"prev\":" + fmt(p) + ",\"cur\":" + fmt(cur(r)) + "}")
                case _ => None
              }
            }
            s"""{"baseline":"$file","round":$rn,"basis":"$basis","compared":${prev.size},"flags":${flags.mkString("{", ",", "}")}}"""
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sanity compare skipped: $e"); "null" }
    }
    val qs = results.map(r => "\"" + r.name + "\":" + fmt(r.median))
      .mkString("{", ",", "}")
    // "med" rides INSIDE each spread entry (r13 Wrong #4): the spread is
    // the last big map in the payload, so it survives the driver's
    // front-truncating tail capture after the queries map is cut off —
    // priorMedians reads it back for the cross-round tripwire
    val spread = results.filter(_.ok).map(r =>
        "\"" + r.name + "\":{\"min\":" + fmt(r.min) + ",\"max\":" + fmt(r.max) +
          ",\"med\":" + fmt(r.median) + "}")
      .mkString("{", ",", "}")
    val errors = results.collect { case r if !r.ok => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case r if r.ok => r.median }.sum
    // host-state stanza (round 16, VERDICT Next #4): the r15 driver run
    // flagged three >2x "regressions" that were ambient host drift (all
    // 29 compared lines moved together, geomean 1.34x). Recording the
    // 1-minute load average at payload time lets the reader tell a
    // loaded-host artifact from a plan regression without a re-run.
    val host = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      s"""{"load_avg":${fmt(os.getSystemLoadAverage)},"cpus":${os.getAvailableProcessors}}"""
    }
    // average executor task-seconds per timed pass, per line (see the
    // listener above; listener events are async — drain briefly first)
    Thread.sleep(500)
    val taskTime = results.filter(_.ok).flatMap { r =>
      Option(taskTimeMs.get(r.name)).map(ms =>
        "\"" + r.name + "\":" + fmt(ms.toDouble / 1000.0 / iters))
    }.mkString("{", ",", "}")
    // task_time rides BETWEEN queries and spread: the spread map (with
    // its embedded "med" copies) must stay LAST among the big maps so
    // it survives the driver's front-truncating tail capture (r13/r14)
    val payload =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"task_time":$taskTime,"spread":$spread,"iters":$iters,"warmup_excluded":true,"interleaved":true,"host":$host,"sanity":$sanity,"errors":$errors,"sf":"$sfDir"}"""
    println(payload)
    // ALSO drop the payload as a bare file: the driver scrapes stdout
    // through sbt, whose [info] prefix has left BENCH_r{N}.json with
    // parsed:null two rounds running — a file needs no log surgery
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_latest.json"), payload + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write: $e") }
    spark.stop()
    // Per-query failures must surface in the exit status (round-10 lesson:
    // three -1.0 lines rode an rc:0 payload into a committed snapshot).
    // The payload is already printed and file-dropped above, so a non-zero
    // exit loses nothing and makes a broken round self-announcing.
    val nFailed = results.count(!_.ok)
    if (nFailed > 0) {
      System.err.println(s"[bench] $nFailed quer${if (nFailed == 1) "y" else "ies"} failed — exiting 1")
      sys.exit(1)
    }
  }
}
