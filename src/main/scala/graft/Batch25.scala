package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 25 (round 11, sixth session, wave 16):
  * stratified k-fold assignment, common-neighbor similarity, streaming
  * snapshot publication.
  */
private[graft] object Batch25 {

  val queries: Seq[Q] = Seq(

    // Stratified 5-fold assignment over documents, stratified by lang:
    // the salted-hash shuffle order and the round-robin deal are both
    // replayed by the oracle, so every row's fold id is under the gate
    // (and with it the exact-balance property).
    Q("q211_kfold",
      (s, dir) => {
        graft.functions.ML.kfoldAssign(Tables.documents(s, dir)
            .select(col("doc_id"), col("lang")),
          "doc_id", k = 5, strataCols = Seq("lang"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
             |  CAST((ROW_NUMBER() OVER (PARTITION BY lang
             |    ORDER BY CAST('0x' || substr(md5('fold' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) ASC,
             |      doc_id ASC) - 1) % 5 AS BIGINT) AS fold
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Common-neighbor similarity on the co-purchase graph (pairs with
    // ≥ 15 shared neighbors): wedge counts, degrees, and the Jaccard
    // ratio all re-derived by the oracle's naive formulation.
    Q("q212_node_similarity",
      (s, dir) => {
        val e = Tables.coPurchaseEdges(s, dir)
        graft.functions.Graphs.nodeSimilarity(e, minCommon = 15L)
          .orderBy("a", "b")
      },
      Some("""WITH e0 AS (SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |sym AS (SELECT i AS w, j AS n FROM e0
             |  UNION ALL SELECT j AS w, i AS n FROM e0),
             |deg AS (SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS degree
             |  FROM sym GROUP BY 1),
             |common AS (SELECT x.n AS a, y.n AS b, CAST(COUNT(*) AS BIGINT) AS common
             |  FROM sym x JOIN sym y ON x.w = y.w AND x.n < y.n
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 15)
             |SELECT a, b, common, da.degree AS deg_a, db.degree AS deg_b,
             |  CAST(common AS DOUBLE) / CAST(da.degree + db.degree - common AS DOUBLE) AS jaccard
             |FROM common
             |JOIN deg da ON common.a = da.node
             |JOIN deg db ON common.b = db.node
             |ORDER BY a, b""".stripMargin)),

    // Streaming snapshot publication: two micro-batches (disjoint order
    // slices) each commit an isolated snapshot version; the LATEST read
    // after the run must be exactly the second batch's rollup (the
    // oracle recomputes it) with versions [1, 2] — continuous
    // publication with the q207 isolation contract, driven from a
    // stream.
    Q("q213_stream_snapshots",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        val snapDir = java.nio.file.Files.createTempDirectory("graft-ssnap-")
          .toAbsolutePath.toString + "/t"
        val rows = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        val ms = MemoryStream[(Long, String, Double)](s)
        val q = graft.streaming.Streams.snapshotSink(
            ms.toDS().toDF("o_orderkey", "o_orderpriority", "o_totalprice"),
            snapDir)
          .option("checkpointLocation", snapDir + "-ckpt").start()
        try {
          ms.addData(rows.filter(_._1 % 3 == 0).toSeq); q.processAllAvailable()
          ms.addData(rows.filter(_._1 % 3 == 1).toSeq); q.processAllAvailable()
        } finally q.stop()
        val versions = graft.sources.IO.snapshotVersions(s, snapDir)
        graft.sources.IO.loadSnapshot(s, snapDir) // latest == batch 2
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("total"))
          .withColumn("n_versions", lit(versions.size.toLong))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  CAST(2 AS BIGINT) AS n_versions
             |FROM orders WHERE o_orderkey % 3 = 1
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
