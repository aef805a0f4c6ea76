package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 19 (round 11, fifth session, wave 10):
  * cross-corpus MinHash join, winsorization, delete-aware CDC merge.
  */
private[graft] object Batch19 {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)

  val queries: Seq[Q] = Seq(

    // Cross-corpus MinHash+LSH near-dup JOIN (delta × corpus — the
    // near-dup analog of q146's incremental exact dedup): doc_id%3==0
    // plays the delta, the rest the corpus; identical signature/banding
    // machinery as q34 (one shared implementation), candidates on the
    // between-tables band-bucket join only. The oracle is q34's full
    // signature re-derivation with the candidate CTE split by side
    // instead of ordered by id.
    Q("q192_minhash_join_across",
      (s, dir) => {
        val d = docs(s, dir)
        graft.functions.Dedup.minhashJoinAcross(
            d.filter(col("doc_id") % 3 === 0),
            d.filter(col("doc_id") % 3 =!= 0),
            "doc_id", "text", n = 3, bands = 8, rowsPerBand = 2,
            minEstSim = 0.25)
          .orderBy("i", "j")
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |    x -> length(x) > 0) AS t
             |  FROM documents),
             |elig AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
             |sh AS (SELECT doc_id, list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gs
             |  FROM elig),
             |hs AS (SELECT doc_id, list_transform(gs,
             |    g -> list_sum(list_transform(range(1, length(g) + 1),
             |      j -> j * unicode(g[j:j]))) % 1000000007) AS hh
             |  FROM sh),
             |sig AS (SELECT doc_id, list_transform(range(0, 16),
             |    i -> list_min(list_transform(hh,
             |      h -> (h * (2*i + 1) + 104729 * (i + 1)) % 1000000007))) AS sig
             |  FROM hs),
             |bands AS (SELECT doc_id, unnest(range(0, 8)) AS b, sig FROM sig),
             |keyed AS (SELECT doc_id, b, sig[2*b + 1] AS h1, sig[2*b + 2] AS h2, sig FROM bands),
             |cand AS (SELECT DISTINCT a.doc_id AS i, c.doc_id AS j, a.sig AS asig, c.sig AS csig
             |  FROM keyed a JOIN keyed c
             |    ON a.b = c.b AND a.h1 = c.h1 AND a.h2 = c.h2
             |    AND a.doc_id % 3 = 0 AND c.doc_id % 3 <> 0)
             |SELECT i, j,
             |  CAST(len(list_filter(range(1, 17), p -> asig[p] = csig[p])) AS DOUBLE) / 16 AS est_sim
             |FROM cand
             |WHERE CAST(len(list_filter(range(1, 17), p -> asig[p] = csig[p])) AS DOUBLE) / 16 >= 0.25
             |ORDER BY i, j""".stripMargin)),

    // Per-group winsorization to the [q05, q95] band: the bounds are
    // quantileDisc member values and the clamp is pure comparison, so
    // the oracle replays bounds AND every clamped value with zero
    // arithmetic tolerance.
    Q("q193_winsorize",
      (s, dir) => {
        graft.functions.ML.winsorize(Tables.orders(s, dir),
            Seq("o_orderpriority"), "o_totalprice", qLo = 0.05, qHi = 0.95)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"), col("lo"), col("hi"),
            col("o_totalprice_w"))
          .orderBy("o_orderkey")
      },
      Some("""WITH lo AS (SELECT o_orderpriority, o_totalprice AS lo FROM (
             |    SELECT o_orderpriority, o_totalprice,
             |      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |        ORDER BY o_totalprice ASC) AS rn,
             |      COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
             |    FROM orders) t
             |  WHERE rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1),
             |hi AS (SELECT o_orderpriority, o_totalprice AS hi FROM (
             |    SELECT o_orderpriority, o_totalprice,
             |      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |        ORDER BY o_totalprice ASC) AS rn,
             |      COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
             |    FROM orders) t
             |  WHERE rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1)
             |SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
             |  lo.lo, hi.hi,
             |  least(greatest(o.o_totalprice, lo.lo), hi.hi) AS o_totalprice_w
             |FROM orders o
             |JOIN lo USING (o_orderpriority) JOIN hi USING (o_orderpriority)
             |ORDER BY o_orderkey""".stripMargin)),

    // Delete-aware CDC merge (the WHEN MATCHED DELETE half of MERGE):
    // day-15 purchases upserted doubled, day-15 clicks tombstoned, and
    // day-20 deleted WHOLE — the fully-emptied partition's directory
    // must disappear (dynamic overwrite alone would leave stale files;
    // the oracle's missing day-20 group row is what catches it). The
    // oracle re-derives the merged table and the per-day rollup.
    Q("q194_cdc_deletes",
      (s, dir) => {
        import graft.sources.IO
        val path = java.nio.file.Files.createTempDirectory("graft-cdcdel-")
          .toAbsolutePath.toString + "/events_cdc_del"
        val ev = Tables.events(s, dir)
          .withColumn("day", to_date(timestamp_micros(expr("ts div 1000"))))
          .select("event_id", "day", "event_type", "value")
        IO.savePartitioned(ev, path, partCols = Seq("day"),
          sortCols = Seq("event_id"))
        val d15 = lit(java.sql.Date.valueOf("2024-01-15"))
        val d20 = lit(java.sql.Date.valueOf("2024-01-20"))
        val ups = ev.filter(col("day") === d15 && col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .withColumn("__op", lit("upsert"))
        val dels = ev.filter((col("day") === d15 && col("event_type") === "click")
            || col("day") === d20)
          .withColumn("__op", lit("delete"))
        IO.upsertPartitionsCdc(s, path, ups.unionByName(dels),
          partCols = Seq("day"), keyCols = Seq("event_id"), opCol = "__op",
          sortCols = Seq("event_id"))
        s.read.parquet(path).groupBy("day")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
          .orderBy("day")
      },
      Some("""WITH base AS (SELECT event_id, CAST(ts AS DATE) AS day, event_type, value
             |  FROM events),
             |ups AS (SELECT event_id, day, event_type, value * 2 AS value
             |  FROM base WHERE day = DATE '2024-01-15' AND event_type = 'purchase'),
             |del AS (SELECT event_id FROM base
             |  WHERE (day = DATE '2024-01-15' AND event_type = 'click')
             |     OR day = DATE '2024-01-20'),
             |merged AS (
             |  SELECT * FROM base
             |  WHERE event_id NOT IN (SELECT event_id FROM ups)
             |    AND event_id NOT IN (SELECT event_id FROM del)
             |  UNION ALL SELECT * FROM ups)
             |SELECT day, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
