package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 22 (round 11, sixth session, wave 13): the
  * remaining pandas merge_asof directions — forward and nearest.
  */
private[graft] object Batch22 {

  val queries: Seq[Q] = Seq(

    // FORWARD asof with tolerance: each purchase takes its user's
    // earliest click AT or AFTER the purchase, but only within 2 h.
    // The oracle is DuckDB's native ASOF with the inequality flipped
    // (l.ts <= r.ts — an independent implementation of the forward
    // semantics) plus the same staleness predicate.
    Q("q204_asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val l = ev.filter(col("event_type") === "purchase")
        val r = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        graft.operators.Joins.asofJoinForward(l, r, Seq("user_id"),
            "ts", "ts", lCols = Seq("event_id", "value"),
            rValueCols = Seq("click_id", "click_value"),
            tolerance = Some(7200000000000L)) // 2 h in ns
          .select(col("event_id"), col("user_id"), col("click_id"),
            col("click_value"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id,
             |  CASE WHEN r.ts IS NOT NULL AND epoch_us(r.ts)*1000 <= epoch_us(l.ts)*1000 + 7200000000000
             |       THEN r.event_id END AS click_id,
             |  CASE WHEN r.ts IS NOT NULL AND epoch_us(r.ts)*1000 <= epoch_us(l.ts)*1000 + 7200000000000
             |       THEN r.value END AS click_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
             |  ON l.user_id = r.user_id AND l.ts <= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // NEAREST asof: whichever of the backward/forward click is closer,
    // exact ties backward. The oracle runs BOTH native ASOF directions
    // and replays the distance choice + tie rule — every selected match
    // (and every null) is under the gate.
    Q("q205_asof_nearest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val l = ev.filter(col("event_type") === "purchase")
        val r = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        graft.operators.Joins.asofJoinNearest(l, r, Seq("user_id"),
            "ts", "ts", lCols = Seq("event_id", "value"),
            rValueCols = Seq("click_id", "click_value"))
          .select(col("event_id"), col("user_id"), col("click_id"),
            col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT * FROM events WHERE event_type = 'click'),
             |b AS (SELECT p.event_id, r.event_id AS b_id, r.value AS b_value,
             |    epoch_us(r.ts)*1000 AS b_t
             |  FROM p ASOF LEFT JOIN c r ON p.user_id = r.user_id AND p.ts >= r.ts),
             |f AS (SELECT p.event_id, r.event_id AS f_id, r.value AS f_value,
             |    epoch_us(r.ts)*1000 AS f_t
             |  FROM p ASOF LEFT JOIN c r ON p.user_id = r.user_id AND p.ts <= r.ts)
             |SELECT p.event_id, p.user_id,
             |  CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
             |         OR epoch_us(p.ts)*1000 - b_t <= f_t - epoch_us(p.ts)*1000) THEN b_id
             |       WHEN f_id IS NOT NULL THEN f_id END AS click_id,
             |  CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
             |         OR epoch_us(p.ts)*1000 - b_t <= f_t - epoch_us(p.ts)*1000) THEN b_value
             |       WHEN f_id IS NOT NULL THEN f_value END AS click_value
             |FROM p JOIN b USING (event_id) JOIN f USING (event_id)
             |ORDER BY p.event_id""".stripMargin))
  )
}
