package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 48 (round 15, session 3): forecast evaluation
  * against the seasonal-naive bar (MASE + sMAPE), embedding-space
  * distribution drift, and market-basket association rules.
  */
private[graft] object Batch48 {

  val queries: Seq[Q] = Seq(

    // MASE/sMAPE per event type: the "model" is the lag-1 naive
    // (yesterday's count), scored against the period-7 seasonal-naive
    // bar — the classic "does persistence beat weekly seasonality"
    // diagnostic. Daily counts are exact integers, so every |err| sum
    // is decimal-exact; the naive denominator is the (key, day−7)
    // equi-join.
    Q("q318_mase_eval",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("actual"))
        val fc = daily.select(col("event_type"), (col("day") + 1).as("day"),
          col("actual").as("forecast"))
        graft.operators.TimeSeries.maseEval(
            daily.join(fc, Seq("event_type", "day"), "left"),
            Seq("event_type"), "day", "actual", "forecast", period = 7)
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             |    CAST(COUNT(*) AS BIGINT) AS actual FROM events GROUP BY 1, 2),
             |fc AS (SELECT event_type, day + 1 AS day, actual AS forecast FROM daily),
             |j AS (SELECT d.event_type, d.day, CAST(d.actual AS DOUBLE) AS a,
             |    CAST(f.forecast AS DOUBLE) AS f
             |  FROM daily d LEFT JOIN fc f ON d.event_type = f.event_type AND d.day = f.day),
             |err AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
             |    SUM(CAST(ABS(f - a) AS DECIMAL(28,6))) AS sae,
             |    CAST(COUNT(CASE WHEN ABS(f) + ABS(a) > 0 THEN 1 END) AS BIGINT) AS n_smape,
             |    SUM(CASE WHEN ABS(f) + ABS(a) > 0
             |      THEN CAST(2.0 * ABS(f - a) / (ABS(f) + ABS(a)) AS DECIMAL(28,12)) END) AS ssm
             |  FROM j WHERE a IS NOT NULL AND f IS NOT NULL GROUP BY 1),
             |nv AS (SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_naive,
             |    SUM(CAST(ABS(d.a0 - p.a0) AS DECIMAL(28,6))) AS san
             |  FROM (SELECT event_type, day, CAST(actual AS DOUBLE) AS a0 FROM daily) d
             |  JOIN (SELECT event_type, day + 7 AS day, CAST(actual AS DOUBLE) AS a0 FROM daily) p
             |    ON d.event_type = p.event_type AND d.day = p.day
             |  GROUP BY 1)
             |SELECT err.event_type, n_eval,
             |  CAST(sae AS DOUBLE) / CAST(n_eval AS DOUBLE) AS mae,
             |  COALESCE(n_naive, 0) AS n_naive,
             |  CASE WHEN n_naive > 0 THEN CAST(san AS DOUBLE) / CAST(n_naive AS DOUBLE) END AS mae_naive,
             |  CASE WHEN n_naive > 0 AND CAST(san AS DOUBLE) / CAST(n_naive AS DOUBLE) > 0
             |    THEN (CAST(sae AS DOUBLE) / CAST(n_eval AS DOUBLE)) /
             |      (CAST(san AS DOUBLE) / CAST(n_naive AS DOUBLE)) END AS mase,
             |  n_smape,
             |  CASE WHEN n_smape > 0 THEN CAST(ssm AS DOUBLE) / CAST(n_smape AS DOUBLE) END AS smape
             |FROM err LEFT JOIN nv ON err.event_type = nv.event_type
             |ORDER BY err.event_type""".stripMargin)),

    // Embedding-cloud drift between the even- and odd-label halves of
    // the embeddings table: per-dim means, ‖μa−μb‖ and cos(μa,μb)
    // folded in dim order. The fixture integerizes the float vectors
    // (floor(x·1000) — exact and identical in both engines) so every
    // per-dim sum is decimal-exact; the operator itself takes any
    // numeric array.
    Q("q319_embedding_drift",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .filter(col("label").isNotNull && col("embedding").isNotNull)
          .select(when(col("label") % 2 === 0, "a").otherwise("b").as("grp"),
            expr("transform(embedding, x -> floor(cast(x as double) * 1000))")
              .as("vec"))
        graft.functions.Similarity.embeddingDrift(e, "grp", "vec", "a", "b")
      },
      Some("""WITH e AS (SELECT CASE WHEN label % 2 = 0 THEN 'a' ELSE 'b' END AS g, embedding
             |  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL),
             |x AS (SELECT g, UNNEST(range(0, len(embedding))) AS dim,
             |    UNNEST(list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT))) AS v
             |  FROM e),
             |s AS (SELECT g, dim, CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(v AS DECIMAL(28,9))) AS s1 FROM x GROUP BY 1, 2),
             |m AS (SELECT g, dim, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu FROM s),
             |j AS (SELECT a.dim, a.n AS na, b.n AS nb, a.mu AS ma, b.mu AS mb
             |  FROM (SELECT * FROM m WHERE g = 'a') a
             |  JOIN (SELECT * FROM m WHERE g = 'b') b ON a.dim = b.dim),
             |agg AS (SELECT MAX(na) AS n_a, MAX(nb) AS n_b, CAST(COUNT(*) AS BIGINT) AS dims,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST((ma - mb) * (ma - mb) ORDER BY dim)), (x, y) -> x + y) AS d2,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(ma * mb ORDER BY dim)), (x, y) -> x + y) AS ab,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(ma * ma ORDER BY dim)), (x, y) -> x + y) AS aa,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(mb * mb ORDER BY dim)), (x, y) -> x + y) AS bb
             |  FROM j)
             |SELECT n_a, n_b, dims,
             |  CASE WHEN dims > 0 THEN sqrt(d2) END AS l2,
             |  CASE WHEN aa > 0 AND bb > 0 THEN ab / (sqrt(aa) * sqrt(bb)) END AS cos_sim
             |FROM agg""".stripMargin)),

    // Pairwise association rules over order baskets (items = part
    // buckets): Apriori support pruning before any pair forms, exact
    // counts, pinned support/confidence/lift chains, deterministic
    // (lift desc, item1, item2) top-25. The 0.003 threshold is CAST
    // AS DOUBLE on the oracle side so both engines run the identical
    // double ceil (DuckDB literals are decimal by default).
    Q("q320_pair_rules",
      (s, dir) => graft.functions.Baskets.pairRules(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), (col("l_partkey") % 50).as("item")),
        "l_orderkey", "item", minSupport = 0.003, topN = 25),
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i
             |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM items),
             |ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ci FROM items GROUP BY 1),
             |freq AS (SELECT i, ci FROM ic, nb WHERE ci >= CEIL(CAST(0.003 AS DOUBLE) * nb)),
             |fi AS (SELECT items.b, items.i FROM items JOIN freq ON items.i = freq.i),
             |p AS (SELECT a.i AS i1, c.i AS i2, CAST(COUNT(*) AS BIGINT) AS cp
             |  FROM fi a JOIN fi c ON a.b = c.b AND a.i < c.i GROUP BY 1, 2),
             |r AS (SELECT i1, i2, nb.nb, f1.ci AS c1, f2.ci AS c2, cp
             |  FROM p JOIN freq f1 ON p.i1 = f1.i JOIN freq f2 ON p.i2 = f2.i, nb
             |  WHERE cp >= CEIL(CAST(0.003 AS DOUBLE) * nb.nb))
             |SELECT CAST(i1 AS BIGINT) AS item1, CAST(i2 AS BIGINT) AS item2,
             |  nb AS n_baskets, c1, c2, cp AS c_pair,
             |  CAST(cp AS DOUBLE) / CAST(nb AS DOUBLE) AS support,
             |  CAST(cp AS DOUBLE) / CAST(c1 AS DOUBLE) AS conf_1_2,
             |  CAST(cp AS DOUBLE) / CAST(c2 AS DOUBLE) AS conf_2_1,
             |  CAST(cp AS DOUBLE) * CAST(nb AS DOUBLE) / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)) AS lift
             |FROM r ORDER BY lift DESC, item1, item2 LIMIT 25""".stripMargin)),
  )
}
