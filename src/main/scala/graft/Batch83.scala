package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 83 (round 19, widening wave): the binary-
  * outcome experimentation shelf (two-proportion inference, proportion
  * MDE sizing, the two-arm conversion mSPRT), token-mass mix thinning,
  * and the Hill tail-index estimator.
  */
private[graft] object Batch83 {

  /** The q452/q453/q456 arm split: md5-hash halves, with a LOWER
    * success threshold on arm b (40 vs 60) so the rates genuinely
    * differ. */
  private val armCase =
    """CASE WHEN CAST('0x' || substr(md5('tp' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
      |      < 2147483648 THEN 'a' ELSE 'b' END""".stripMargin

  val queries: Seq[Q] = Seq(

    // Two-proportion inference on hash-split purchase conversion
    // (success = value above a per-arm threshold): pooled z, Wald
    // diff CI, Katz log-RR CI, and Woolf log-OR CI — every division,
    // sqrt, ln, and exp replayed by DuckDB in the same IEEE order.
    Q("q452_two_proportion",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "tp") <
              2147483648L, "a").otherwise("b"))
          .withColumn("s", (col("value") >
            when(col("grp") === "a", 60.0).otherwise(40.0)).cast("int"))
        graft.operators.Analytics.twoProportionTest(ev, "grp", "s",
          "a", "b")
      },
      Some(s"""WITH g AS (SELECT $armCase AS arm,
             |    CASE WHEN value > CASE WHEN $armCase = 'a'
             |      THEN 60.0 ELSE 40.0 END THEN 1 ELSE 0 END AS s
             |  FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |c AS (SELECT
             |    CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN arm = 'a' THEN s ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN arm = 'b' THEN s ELSE 0 END) AS BIGINT) AS x_b
             |  FROM g),
             |p AS (SELECT *,
             |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
             |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
             |    (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
             |  FROM c),
             |e AS (SELECT *, p_a - p_b AS diff,
             |    pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) AS vp,
             |    sqrt(p_a * (1.0 - p_a) / CAST(n_a AS DOUBLE)
             |       + p_b * (1.0 - p_b) / CAST(n_b AS DOUBLE)) AS sew,
             |    sqrt((1.0 - p_a) / CAST(x_a AS DOUBLE)
             |       + (1.0 - p_b) / CAST(x_b AS DOUBLE)) AS selr,
             |    sqrt(1.0 / CAST(x_a AS DOUBLE) + 1.0 / CAST(n_a - x_a AS DOUBLE)
             |       + 1.0 / CAST(x_b AS DOUBLE) + 1.0 / CAST(n_b - x_b AS DOUBLE)) AS selo,
             |    (CAST(x_a AS DOUBLE) * CAST(n_b - x_b AS DOUBLE))
             |      / (CAST(x_b AS DOUBLE) * CAST(n_a - x_a AS DOUBLE)) AS odr
             |  FROM p)
             |SELECT n_a, x_a, n_b, x_b, p_a, p_b, diff,
             |  CASE WHEN vp > 0 THEN diff / sqrt(vp) END AS z,
             |  diff - 1.959964 * sew AS diff_lo,
             |  diff + 1.959964 * sew AS diff_hi,
             |  CASE WHEN x_a > 0 AND x_b > 0 THEN p_a / p_b END AS risk_ratio,
             |  exp(ln(p_a / p_b) - 1.959964 * selr) AS rr_lo,
             |  exp(ln(p_a / p_b) + 1.959964 * selr) AS rr_hi,
             |  CASE WHEN x_a > 0 AND x_b > 0 AND n_a - x_a > 0 AND n_b - x_b > 0
             |    THEN odr END AS odds_ratio,
             |  exp(ln(odr) - 1.959964 * selo) AS or_lo,
             |  exp(ln(odr) + 1.959964 * selo) AS or_hi
             |FROM e""".stripMargin)),

    // Proportion MDE on the same split: pooled-rate null-variance
    // sizing with the fixed z literals.
    Q("q453_mde_proportion",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "tp") <
              2147483648L, "a").otherwise("b"))
          .withColumn("s", (col("value") >
            when(col("grp") === "a", 60.0).otherwise(40.0)).cast("int"))
        graft.operators.Analytics.mdeProportion(ev, "grp", "s", "a", "b")
      },
      Some(s"""WITH g AS (SELECT $armCase AS arm,
             |    CASE WHEN value > CASE WHEN $armCase = 'a'
             |      THEN 60.0 ELSE 40.0 END THEN 1 ELSE 0 END AS s
             |  FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |c AS (SELECT
             |    CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN arm = 'a' THEN s ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN arm = 'b' THEN s ELSE 0 END) AS BIGINT) AS x_b
             |  FROM g),
             |p AS (SELECT n_a, n_b,
             |    (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS p_pool
             |  FROM c),
             |v AS (SELECT *,
             |    p_pool * (1.0 - p_pool) * (1.0 / CAST(n_a AS DOUBLE)
             |      + 1.0 / CAST(n_b AS DOUBLE)) AS vv FROM p)
             |SELECT n_a, n_b, p_pool,
             |  CASE WHEN vv > 0 THEN (1.959964 + 0.841621) * sqrt(vv) END AS mde_abs,
             |  CASE WHEN p_pool > 0
             |    THEN CASE WHEN vv > 0 THEN (1.959964 + 0.841621) * sqrt(vv) END / p_pool
             |  END AS mde_rel
             |FROM v""".stripMargin)),

    // Token-MASS mix thinning to 50/30/20 across three sources: the
    // per-domain token sums, the binding-domain S, the derived rates,
    // the integer hash thresholds, and the kept id set all replayed
    // by DuckDB from the same sums.
    Q("q454_token_mix_shares",
      (s, dir) => graft.functions.Sampling.tokenMixToShares(
        Tables.documents(s, dir).select(
          col("doc_id"), col("source"),
          (pmod(col("doc_id") * 7919L, lit(400L)) + 50L).as("tokens")),
        "source", "doc_id", "tokens",
        Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), salt = "tmx")
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, source,
             |    CAST((doc_id * 7919) % 400 + 50 AS BIGINT) AS tokens
             |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
             |m AS (SELECT
             |    CAST(SUM(CASE WHEN source = 'src0' THEN tokens ELSE 0 END) AS BIGINT) AS t0,
             |    CAST(SUM(CASE WHEN source = 'src1' THEN tokens ELSE 0 END) AS BIGINT) AS t1,
             |    CAST(SUM(CASE WHEN source = 'src2' THEN tokens ELSE 0 END) AS BIGINT) AS t2
             |  FROM b),
             |sm AS (SELECT t0, t1, t2,
             |    LEAST(CAST(t0 AS DOUBLE) / 0.5, CAST(t1 AS DOUBLE) / 0.3,
             |      CAST(t2 AS DOUBLE) / 0.2) AS s FROM m),
             |r AS (SELECT
             |    s * 0.5 / CAST(t0 AS DOUBLE) AS r0,
             |    s * 0.3 / CAST(t1 AS DOUBLE) AS r1,
             |    s * 0.2 / CAST(t2 AS DOUBLE) AS r2 FROM sm),
             |th AS (SELECT
             |    CAST(FLOOR(r0 * 4294967296.0) AS BIGINT) AS h0,
             |    CAST(FLOOR(r1 * 4294967296.0) AS BIGINT) AS h1,
             |    CAST(FLOOR(r2 * 4294967296.0) AS BIGINT) AS h2,
             |    r0, r1, r2 FROM r)
             |SELECT b.doc_id, b.source, b.tokens,
             |  CASE b.source WHEN 'src0' THEN th.r0 WHEN 'src1' THEN th.r1
             |    ELSE th.r2 END AS keep_rate
             |FROM b CROSS JOIN th
             |WHERE CAST('0x' || substr(md5('tmx' || CAST(b.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |  < CASE b.source WHEN 'src0' THEN th.h0 WHEN 'src1' THEN th.h1
             |      ELSE th.h2 END
             |ORDER BY b.doc_id""".stripMargin)),

    // Hill tail index over the top-100 purchase values: the threshold
    // order statistic, each pinned ln ratio quantized at scale 18,
    // the exact sum, and 1/alpha all replayed by DuckDB.
    Q("q455_hill_tail",
      (s, dir) => graft.operators.Analytics.hillTailIndex(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        "value", k = 100),
      Some("""WITH pos AS (SELECT CAST(value AS DOUBLE) AS v FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL
             |    AND CAST(value AS DOUBLE) > 0),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pos FROM pos),
             |top AS (SELECT v FROM pos ORDER BY v DESC LIMIT 101),
             |kt AS (SELECT MIN(v) AS x_k1, COUNT(*) AS c FROM top),
             |s AS (SELECT COALESCE(CAST(SUM(CAST(ln(top.v / kt.x_k1)
             |      AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS lnsum
             |  FROM top CROSS JOIN kt WHERE top.v > kt.x_k1)
             |SELECT n.n_pos, CAST(100 AS BIGINT) AS k,
             |  CASE WHEN kt.c = 101 THEN kt.x_k1 END AS x_k1,
             |  CASE WHEN kt.c = 101 THEN s.lnsum / 100.0 END AS hill_inv,
             |  CASE WHEN kt.c = 101 AND s.lnsum > 0
             |    THEN 100.0 / s.lnsum END AS alpha
             |FROM n CROSS JOIN kt CROSS JOIN s""".stripMargin)),

    // The two-arm CONVERSION monitor: per-observation pooled-variance
    // mSPRT over the hash-split success stream — the deployed
    // sequential shape for rate metrics; every cumulative count and
    // the pinned pooled-variance chain replayed by DuckDB.
    Q("q456_msprt_two_proportion",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "tp") <
              2147483648L, "a").otherwise("b"))
          .withColumn("s", (col("value") >
            when(col("grp") === "a", 60.0).otherwise(40.0)).cast("int"))
        graft.operators.Analytics.msprtTwoProportionTest(ev, "event_id",
          "grp", "s", "a", "b", tau2 = 0.05, alpha = 0.05)
      },
      Some(s"""WITH g AS (SELECT event_id AS t,
             |    CASE WHEN $armCase = 'a' THEN 1 ELSE 0 END AS ia,
             |    CASE WHEN value > CASE WHEN $armCase = 'a'
             |      THEN 60.0 ELSE 40.0 END THEN 1 ELSE 0 END AS s
             |  FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |c AS (SELECT t, ia,
             |    CAST(SUM(ia) OVER w AS BIGINT) AS n_a,
             |    CAST(SUM(ia * s) OVER w AS BIGINT) AS x_a,
             |    CAST(SUM(1 - ia) OVER w AS BIGINT) AS n_b,
             |    CAST(SUM((1 - ia) * s) OVER w AS BIGINT) AS x_b
             |  FROM g WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT t, n_a, n_b,
             |    CASE WHEN n_a > 0
             |      THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS p_a,
             |    CASE WHEN n_b > 0
             |      THEN CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS p_b,
             |    (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
             |  FROM c),
             |v AS (SELECT *,
             |    pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)
             |      + 1.0 / CAST(n_b AS DOUBLE)) AS vt FROM m),
             |e AS (SELECT t, n_a, n_b, p_a, p_b,
             |    CASE WHEN n_a > 0 AND n_b > 0 AND vt > 0.0 THEN
             |      0.5 * LN(vt / (vt + 0.05))
             |      + ((p_a - p_b) * (p_a - p_b) * 0.05)
             |        / (2.0 * vt * (vt + 0.05))
             |    END AS e_log FROM v)
             |SELECT t, n_a, n_b, p_a, p_b, e_log,
             |  CASE WHEN e_log IS NOT NULL
             |    THEN e_log >= LN(1.0 / 0.05) END AS crossed
             |FROM e ORDER BY t""".stripMargin))
  )
}
