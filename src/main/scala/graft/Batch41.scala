package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 41 (round 12): the streaming Markov-transition
  * twin.
  */
private[graft] object Batch41 {

  val queries: Seq[Q] = Seq(

    // Streaming transitions driven in TWO micro-batches split at the
    // median timestamp — every user's boundary transition must come out
    // of state, every in-batch ordering out of the group sort — then
    // aggregated to the SAME matrix the batch operator produces: q245's
    // oracle gates this VERBATIM (counts AND probabilities).
    Q("q249_stream_transitions",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        import graft.streaming.Streams
        val ev = Tables.events(s, dir)
          .withColumn("ts_us", expr("ts div 1000"))
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type"))
        val rows = ev.collect().map(r => Streams.SeqEvent(
          r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        val cut = rows.map(_.tsUs).sorted.apply(rows.length / 2)
        val (b1, b2) = rows.partition(_.tsUs < cut)
        val ms = MemoryStream[Streams.SeqEvent](s)
        val out = Streams.streamingTransitions(ms.toDS())
          .toDF("user_id", "prev", "next")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q249_sink").start()
        try {
          ms.addData(b1.toSeq); q.processAllAvailable()
          ms.addData(b2.toSeq); q.processAllAvailable()
        } finally q.stop()
        val t = s.table("q249_sink")
          .groupBy("prev", "next").agg(count(lit(1)).as("c"))
        val tot = t.groupBy(col("prev").as("__p2")).agg(sum(col("c")).as("__n"))
        t.join(broadcast(tot), col("prev") === col("__p2"))
          .select(col("prev"), col("next"), col("c"),
            (col("c").cast("double") / col("__n").cast("double")).as("p"))
          .orderBy("prev", "next")
      },
      Some("""WITH s AS (SELECT user_id, event_type,
             |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events),
             |t AS (SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS n FROM t GROUP BY prev)
             |SELECT t.prev, t.next, t.c, CAST(t.c AS DOUBLE) / CAST(tot.n AS DOUBLE) AS p
             |FROM t JOIN tot ON t.prev = tot.prev ORDER BY t.prev, t.next""".stripMargin))
  )
}
