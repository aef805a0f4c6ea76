package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 33 (round 12): the streaming PSI drift monitor
  * and exact distinct-bounded global percentiles.
  */
private[graft] object Batch33 {

  val queries: Seq[Q] = Seq(

    // Streaming windowed PSI under the FULL exact oracle (unlike the
    // sketch-quantile monitor q122, whose gate is bounds-only): daily
    // windows of the drifted "cur" slice scored against the "ref"
    // split's bin counts. The reference histogram, every window's bin
    // counts (mergeable HistAgg state), the Laplace smoothing, each
    // pinned term, and the exact decimal term sum are ALL replayed by
    // DuckDB — streaming execution (MemoryStream → watermark → append)
    // must land bit-identical to the batch formula per window.
    Q("q232_stream_psi",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        import graft.functions.{Sampling, Sketches}
        val g = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(Sampling.hashU32(col("event_id"), "psi") < 2147483648L,
              "ref").otherwise("cur"))
        val refCounts = g.filter(col("grp") === "ref")
          .agg(Sketches.histCol(0.0, 400.0, 20)(col("value")).as("h"))
          .collect().head.getSeq[Long](0)
        val cur = g.filter(col("grp") === "cur")
          .select(expr("ts div 1000").as("ts_us"),
            when(col("event_id") % 3 === 0, col("value") * 2)
              .otherwise(col("value")).as("value"))
        val rows = cur.collect().map(r => (r.getLong(0), r.getDouble(1)))
        val dayUs = 86400L * 1000000L
        val flush = (rows.map(_._1).max / dayUs + 4) * dayUs + 1L
        val ms = MemoryStream[(Long, Double)](s)
        val out = graft.streaming.Streams.windowedPsi(
          ms.toDS().toDF("ts_us", "value"), refCounts,
          lo = 0.0, hi = 400.0, watermark = "0 seconds", window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q232_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData((flush, 0.0)); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q232_sink").filter(col("bucket_us") <= maxBucket)
          .orderBy("bucket_us")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('psi' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value, ts
             |  FROM events WHERE event_type = 'purchase'),
             |refb AS (SELECT LEAST(GREATEST(CAST(TRUNC((value - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin
             |  FROM g WHERE grp = 'ref'),
             |spine AS (SELECT unnest(range(0, 20)) AS bin),
             |rc AS (SELECT s.bin, COALESCE(r.c, 0) AS rc FROM spine s
             |  LEFT JOIN (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM refb GROUP BY bin) r ON s.bin = r.bin),
             |nr AS (SELECT SUM(rc) AS nr FROM rc),
             |cur AS (SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             |    LEAST(GREATEST(CAST(TRUNC(((CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END) - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin
             |  FROM g WHERE grp = 'cur'),
             |cb AS (SELECT bucket_us, bin, CAST(COUNT(*) AS BIGINT) AS c FROM cur GROUP BY 1, 2),
             |nw AS (SELECT bucket_us, SUM(c) AS n FROM cb GROUP BY 1),
             |full0 AS (SELECT nw.bucket_us, nw.n, s.bin, COALESCE(cb.c, 0) AS c
             |  FROM nw CROSS JOIN spine s LEFT JOIN cb ON cb.bucket_us = nw.bucket_us AND cb.bin = s.bin),
             |terms AS (SELECT f.bucket_us, f.n,
             |    CAST(((CAST(f.c + 1 AS DOUBLE) / CAST(f.n + 20 AS DOUBLE)
             |         - CAST(rc.rc + 1 AS DOUBLE) / CAST(nr.nr + 20 AS DOUBLE))
             |      * ln((CAST(f.c + 1 AS DOUBLE) / CAST(f.n + 20 AS DOUBLE))
             |         / (CAST(rc.rc + 1 AS DOUBLE) / CAST(nr.nr + 20 AS DOUBLE)))) AS DECIMAL(28,12)) AS term
             |  FROM full0 f JOIN rc ON f.bin = rc.bin CROSS JOIN nr)
             |SELECT CAST(bucket_us AS BIGINT) AS bucket_us, CAST(n AS BIGINT) AS n,
             |  CAST(SUM(term) AS DOUBLE) AS psi
             |FROM terms GROUP BY 1, 2 ORDER BY bucket_us""".stripMargin)),

    // Exact global percentiles (percentile_cont semantics) WITHOUT a
    // row sort: value counts + one distinct-value cumulative window +
    // rank-interval containment joins, interpolation as a pinned double
    // chain — the counts, cumulative ranks, bracketing values, and the
    // interpolation are all replayed (and the result equals DuckDB's
    // own quantile_cont, checked at authoring time).
    Q("q233_quantiles_cont",
      (s, dir) => graft.operators.Aggregations.quantilesCont(
        Tables.lineitem(s, dir), "l_extendedprice",
        Seq(0.01, 0.25, 0.5, 0.75, 0.99)),
      Some("""WITH c AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |cum AS (SELECT v, c,
             |  COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER () AS n FROM c),
             |p AS (SELECT unnest(CAST([0.01, 0.25, 0.5, 0.75, 0.99] AS DOUBLE[])) AS p),
             |lo AS (SELECT p.p, cum.n, cum.v AS vlo,
             |    p.p * (cum.n - 1) - FLOOR(p.p * (cum.n - 1)) AS frac
             |  FROM cum JOIN p ON cum.s <= CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT)
             |    AND CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) < cum.s + cum.c),
             |hi AS (SELECT p.p AS p2, cum.v AS vhi
             |  FROM cum JOIN p ON cum.s <= LEAST(CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) + 1, cum.n - 1)
             |    AND LEAST(CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) + 1, cum.n - 1) < cum.s + cum.c)
             |SELECT lo.p, CAST(lo.n AS BIGINT) AS n, vlo + frac * (vhi - vlo) AS value
             |FROM lo JOIN hi ON lo.p = hi.p2 ORDER BY p""".stripMargin))
  )
}
