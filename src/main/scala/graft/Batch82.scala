package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 82 (round 19): the r18 verdict's experimentation
  * and curation agenda — the salted hot-score token budget, the
  * streaming two-sample mSPRT monitor, classical group-sequential
  * designs (O'Brien–Fleming / Pocock), and the joint budget×mix
  * curation knapsack.
  */
private[graft] object Batch82 {

  val queries: Seq[Q] = Seq(

    // Salted token-budget curation on a QUANTIZED score (six integer
    // quality levels — the hot-score shape): ranking is (score DESC,
    // hashU32(id, salt) ASC, id ASC), the hash riding a keyed
    // distributed prefix instead of one serialized tie window. DuckDB
    // replays the md5 tiebreak and the re-ranked cumulative.
    Q("q447_token_budget_salted",
      (s, dir) => graft.functions.Sampling.tokenBudgetSample(
        Tables.documents(s, dir).select(
          col("doc_id"),
          pmod(col("doc_id") * 2654435761L, lit(6L)).cast("double")
            .as("score"),
          (pmod(col("doc_id") * 7919L, lit(400L)) + 50L).as("tokens")),
        "doc_id", "score", "tokens", budget = 30000L,
        tieBreakSalt = Some("tbs"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
             |    CAST((doc_id * 2654435761) % 6 AS DOUBLE) AS score,
             |    CAST((doc_id * 7919) % 400 + 50 AS BIGINT) AS tokens,
             |    CAST('0x' || substr(md5('tbs' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS tb
             |  FROM documents),
             |c AS (SELECT doc_id, score, tokens,
             |    CAST(SUM(tokens) OVER (ORDER BY score DESC, tb ASC,
             |      doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS cum_tokens
             |  FROM b)
             |SELECT doc_id, score, tokens, cum_tokens,
             |  cum_tokens <= 30000 AS kept
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Streaming TWO-SAMPLE mSPRT monitor (the deployed A/B shape)
    // under the q430 MemoryStream discipline: daily closed windows of
    // hash-split purchase arms (arm b shifted +20) fold through the
    // single-key per-arm (N, S) exact-decimal state — split across
    // TWO micro-batches so the carry is exercised — and every emitted
    // window must land bit-identical to DuckDB's batch replay of the
    // same window prefixes.
    Q("q448_stream_msprt_two_sample",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val cur = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .select(expr("ts div 1000").as("ts_us"),
            when(graft.functions.Sampling.hashU32(col("event_id"), "m2s") <
              2147483648L, "a").otherwise("b").as("grp"),
            col("value"))
          .withColumn("v", when(col("grp") === "b", col("value") + 20.0)
            .otherwise(col("value")))
        val rows = cur.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
        val dayUs = 86400L * 1000000L
        val mid = (rows.map(_._1).min / dayUs + 14) * dayUs
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, String, Double)](s)
        val out = graft.streaming.Streams.windowedMsprtTwoSample(
          ms.toDS().toDF("ts_us", "grp", "value"), "grp", "a", "b",
          sigma2 = 8000.0, tau2 = 400.0, alpha = 0.05,
          watermark = "0 seconds", window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q448_sink").start()
        try {
          ms.addData(rows.filter(_._1 < mid).toSeq)
          q.processAllAvailable()
          ms.addData(rows.filter(_._1 >= mid).toSeq)
          q.processAllAvailable()
          ms.addData((flush, "a", 0.0)); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q448_sink").filter(col("bucket_us") <= maxBucket)
          .orderBy("bucket_us")
      },
      Some("""WITH cur AS (SELECT
             |    (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             |    CASE WHEN CAST('0x' || substr(md5('m2s' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'a' ELSE 'b' END AS arm,
             |    value FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |p AS (SELECT bucket_us, arm,
             |    CASE WHEN arm = 'b' THEN value + 20.0 ELSE value END AS v
             |  FROM cur),
             |wb AS (SELECT bucket_us,
             |    CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a_window,
             |    SUM(CASE WHEN arm = 'a' THEN CAST(v AS DECIMAL(28,12))
             |      ELSE CAST(0 AS DECIMAL(28,12)) END) AS sa,
             |    CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b_window,
             |    SUM(CASE WHEN arm = 'b' THEN CAST(v AS DECIMAL(28,12))
             |      ELSE CAST(0 AS DECIMAL(28,12)) END) AS sb
             |  FROM p GROUP BY 1),
             |cum AS (SELECT bucket_us, n_a_window, n_b_window,
             |    CAST(SUM(n_a_window) OVER w AS BIGINT) AS n_a,
             |    CAST(SUM(n_b_window) OVER w AS BIGINT) AS n_b,
             |    SUM(sa) OVER w AS csa, SUM(sb) OVER w AS csb
             |  FROM wb WINDOW w AS (ORDER BY bucket_us ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT bucket_us, n_a_window, n_b_window, n_a, n_b,
             |    CASE WHEN n_a > 0
             |      THEN CAST(csa AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0
             |      THEN CAST(csb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b
             |  FROM cum),
             |e AS (SELECT *,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      0.5 * LN((8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             |        / (8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) + 400.0))
             |      + ((mean_a - mean_b) * (mean_a - mean_b) * 400.0)
             |        / (2.0 * (8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             |           * (8000.0 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) + 400.0))
             |    END AS e_log FROM m)
             |SELECT bucket_us, n_a_window, n_b_window, n_a, n_b,
             |  mean_a, mean_b, e_log,
             |  CASE WHEN e_log IS NOT NULL
             |    THEN e_log >= LN(1.0 / 0.05) END AS crossed
             |FROM e ORDER BY bucket_us""".stripMargin)),

    // O'Brien–Fleming group-sequential design over 5 planned looks
    // (hash-split purchase arms, arm b shifted +12): the steep early
    // boundary 2.040·√(5/ℓ) HOLDS at look 1 (|z| ≈ 2.78 < 4.56) and
    // crosses from look 2 — the textbook OBF shape. Cumulative
    // exact-decimal moments, the Welch z chain, the published
    // boundary constants, and the running stop decision are all
    // replayed by DuckDB.
    Q("q449_group_seq_obf",
      (s, dir) => graft.operators.Analytics.groupSequentialTest(
        Tables.events(s, dir).filter(col("event_type") === "purchase")
          .withColumn("look", pmod(col("event_id"), lit(5L)) + 1L)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "gs") <
              2147483648L, "a").otherwise("b"))
          .withColumn("v", when(col("grp") === "b", col("value") + 12.0)
            .otherwise(col("value"))),
        "look", "grp", "v", "a", "b", k = 5, design = "obf"),
      Some(groupSeqOracle(boundarySql =
        "2.040 * sqrt(5.0 / CAST(look AS DOUBLE))"))),

    // The same 5-look design under Pocock's FLAT boundary (2.413):
    // look 1's |z| ≈ 2.78 already crosses — the design contrast with
    // q449 (Pocock spends alpha early, OBF hoards it) on the same
    // fixture, same oracle machinery.
    Q("q450_group_seq_pocock",
      (s, dir) => graft.operators.Analytics.groupSequentialTest(
        Tables.events(s, dir).filter(col("event_type") === "purchase")
          .withColumn("look", pmod(col("event_id"), lit(5L)) + 1L)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "gs") <
              2147483648L, "a").otherwise("b"))
          .withColumn("v", when(col("grp") === "b", col("value") + 12.0)
            .otherwise(col("value"))),
        "look", "grp", "v", "a", "b", k = 5, design = "pocock"),
      Some(groupSeqOracle(boundarySql = "CAST(2.413 AS DOUBLE)"))),

    // Joint budget×mix curation: a 30k-token budget split 50/30/20
    // across three sources, each domain filling its share by best
    // score independently (per-domain greedy knapsack on a keyed
    // prefix). DuckDB replays the floor'd budget split and all three
    // per-domain re-ranked cumulatives.
    Q("q451_token_budget_by_mix",
      (s, dir) => graft.functions.Sampling.tokenBudgetByMix(
        Tables.documents(s, dir).select(
          col("doc_id"), col("source"),
          (pmod(col("doc_id") * 2654435761L, lit(1000L)).cast("double") /
            lit(1000.0)).as("score"),
          (pmod(col("doc_id") * 7919L, lit(400L)) + 50L).as("tokens")),
        "doc_id", "score", "tokens", "source", budget = 30000L,
        mix = Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, source,
             |    CAST((doc_id * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS score,
             |    CAST((doc_id * 7919) % 400 + 50 AS BIGINT) AS tokens
             |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
             |c AS (SELECT doc_id, source AS domain, score, tokens,
             |    CAST(SUM(tokens) OVER (PARTITION BY source
             |      ORDER BY score DESC, doc_id ASC
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             |    CAST(CASE source WHEN 'src0' THEN 15000
             |      WHEN 'src1' THEN 9000 ELSE 6000 END AS BIGINT)
             |      AS domain_budget
             |  FROM b)
             |SELECT doc_id, domain, score, tokens, cum_tokens,
             |  domain_budget, cum_tokens <= domain_budget AS kept
             |FROM c ORDER BY doc_id""".stripMargin))
  )

  /** The shared group-sequential oracle: cumulative per-look
    * exact-decimal moments, the Welch z chain, and the running stop —
    * only the boundary expression differs between designs. */
  private def groupSeqOracle(boundarySql: String): String =
    s"""WITH g AS (SELECT ((event_id % 5) + 1) AS look,
       |    CASE WHEN CAST('0x' || substr(md5('gs' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
       |      < 2147483648 THEN 'a' ELSE 'b' END AS arm,
       |    value AS v0 FROM events
       |  WHERE event_type = 'purchase' AND value IS NOT NULL),
       |p AS (SELECT look, arm,
       |    CASE WHEN arm = 'b' THEN v0 + 12.0 ELSE v0 END AS v FROM g),
       |pl AS (SELECT look,
       |    CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    SUM(CASE WHEN arm = 'a' THEN CAST(v AS DECIMAL(18,2)) END) AS sa,
       |    SUM(CASE WHEN arm = 'a' THEN CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2)) END) AS ssa,
       |    CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |    SUM(CASE WHEN arm = 'b' THEN CAST(v AS DECIMAL(18,2)) END) AS sb,
       |    SUM(CASE WHEN arm = 'b' THEN CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2)) END) AS ssb
       |  FROM p GROUP BY look),
       |cm AS (SELECT look,
       |    CAST(SUM(na) OVER w AS BIGINT) AS cna, SUM(sa) OVER w AS csa,
       |    SUM(ssa) OVER w AS cssa,
       |    CAST(SUM(nb) OVER w AS BIGINT) AS cnb, SUM(sb) OVER w AS csb,
       |    SUM(ssb) OVER w AS cssb
       |  FROM pl WINDOW w AS (ORDER BY look ROWS UNBOUNDED PRECEDING)),
       |st AS (SELECT look, CAST(look AS DOUBLE) / 5.0 AS t,
       |    cna AS n_a, cnb AS n_b,
       |    CASE WHEN cna > 0 THEN CAST(csa AS DOUBLE) / CAST(cna AS DOUBLE) END AS mean_a,
       |    CASE WHEN cnb > 0 THEN CAST(csb AS DOUBLE) / CAST(cnb AS DOUBLE) END AS mean_b,
       |    CASE WHEN cna >= 2 THEN (CAST(cssa AS DOUBLE) - CAST(csa AS DOUBLE) * CAST(csa AS DOUBLE) / CAST(cna AS DOUBLE)) / (CAST(cna AS DOUBLE) - 1.0) END AS va,
       |    CASE WHEN cnb >= 2 THEN (CAST(cssb AS DOUBLE) - CAST(csb AS DOUBLE) * CAST(csb AS DOUBLE) / CAST(cnb AS DOUBLE)) / (CAST(cnb AS DOUBLE) - 1.0) END AS vb
       |  FROM cm),
       |zz AS (SELECT look, t, n_a, n_b, mean_a, mean_b,
       |    CASE WHEN va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
       |      THEN sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) END AS se
       |  FROM st),
       |zb AS (SELECT look, t, n_a, n_b, mean_a, mean_b, se,
       |    (mean_a - mean_b) / se AS z,
       |    $boundarySql AS boundary
       |  FROM zz),
       |cr AS (SELECT *, CASE WHEN z IS NOT NULL
       |    THEN abs(z) >= boundary END AS crossed FROM zb)
       |SELECT look, t, n_a, n_b, mean_a, mean_b, se, z, boundary,
       |  crossed,
       |  MAX(CASE WHEN crossed THEN 1 ELSE 0 END) OVER
       |    (ORDER BY look ROWS UNBOUNDED PRECEDING) = 1 AS stopped
       |FROM cr ORDER BY look""".stripMargin
}
