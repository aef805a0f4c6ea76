package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 70 (round 17, wave 2): one-sample KS
  * uniformity, partial correlation, Breslow–Day OR homogeneity (the
  * CMH companion), and Yuen's robust trimmed-means t-test.
  */
private[graft] object Batch70 {

  val queries: Seq[Q] = Seq(

    // One-sample KS of the salted-hash fraction against U(0,1): the
    // direct check on the library's own sampling uniformity
    // assumption. The md5-derived draws are replayed bit-for-bit.
    Q("q409_ks_uniform",
      (s, dir) => graft.operators.Analytics.ksUniformTest(
        Tables.events(s, dir).select(
          graft.functions.Sampling.hashFraction(col("event_id"), "ku")
            .as("u")),
        "u", 0.0, 1.0),
      Some("""WITH u AS (SELECT
             |    CAST(CAST('0x' || substr(md5('ku' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS v
             |  FROM events),
             |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1),
             |cum AS (SELECT v, c,
             |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |    SUM(c) OVER () AS n
             |  FROM c),
             |g AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
             |    MAX(CAST(s + c AS DOUBLE) / CAST(n AS DOUBLE) -
             |      LEAST(GREATEST(v, 0.0), 1.0)) AS dp,
             |    MAX(LEAST(GREATEST(v, 0.0), 1.0) -
             |      CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS dm
             |  FROM cum)
             |SELECT n, GREATEST(dp, 0.0) AS d_plus,
             |  GREATEST(dm, 0.0) AS d_minus,
             |  GREATEST(GREATEST(dp, 0.0), GREATEST(dm, 0.0)) AS d
             |FROM g""".stripMargin)),

    // G-test of independence between order priority and order status:
    // the likelihood-ratio chi-square via the share-based MI identity
    // (2n*MI in nats), null-safe level counts for the dof.
    Q("q410_g_test",
      (s, dir) => graft.operators.Analytics.gTest(
        Tables.orders(s, dir), "o_orderpriority", "o_orderstatus"),
      Some("""WITH p AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1, 2),
             |mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM p GROUP BY 1),
             |my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM p GROUP BY 1),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(COUNT(DISTINCT x) + MAX(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kx,
             |    CAST(COUNT(DISTINCT y) + MAX(CASE WHEN y IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ky
             |  FROM p),
             |mi AS (SELECT CAST(SUM(c) AS BIGINT) AS n, MAX(kx) AS k_x, MAX(ky) AS k_y,
             |    CAST(SUM(CAST((CAST(c AS DOUBLE) / CAST(tot.n AS DOUBLE)) *
             |      ln(CAST(tot.n AS DOUBLE) * CAST(c AS DOUBLE) /
             |        (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) AS DECIMAL(28,12))) AS DOUBLE) AS mi
             |  FROM p JOIN mx ON p.x IS NOT DISTINCT FROM mx.x
             |    JOIN my ON p.y IS NOT DISTINCT FROM my.y, tot)
             |SELECT n, k_x, k_y, 2.0 * CAST(n AS DOUBLE) * mi AS g,
             |  CASE WHEN k_x > 1 AND k_y > 1
             |    THEN (k_x - 1) * (k_y - 1) END AS dof
             |FROM mi""".stripMargin)),

    // Breslow-Day homogeneity over user-parity strata: is the
    // click -> high-value odds ratio the same in both segments, or is
    // q378's pooled CMH summary hiding a flip. Fitted counts solve the
    // per-stratum quadratic under the pooled MH OR.
    Q("q411_breslow_day",
      (s, dir) => graft.operators.Analytics.breslowDay(
        Tables.events(s, dir)
          .withColumn("seg", pmod(col("user_id"), lit(2L))),
        Seq("seg"), col("event_type") === "click",
        col("value") > 50.0),
      Some("""WITH cells AS (SELECT user_id % 2 AS seg,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |    CAST(SUM(CASE WHEN event_type = 'click' AND NOT (value > 50.0) THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(SUM(CASE WHEN event_type <> 'click' AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(SUM(CASE WHEN event_type <> 'click' AND NOT (value > 50.0) THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM events GROUP BY 1),
             |w AS (SELECT seg, a, b, c, d, a + b + c + d AS n FROM cells),
             |psi AS (SELECT
             |    CAST(SUM(CAST(CASE WHEN n > 0 THEN CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS r,
             |    CAST(SUM(CAST(CASE WHEN n > 0 THEN CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS s
             |  FROM w),
             |p2 AS (SELECT CASE WHEN s > 0 THEN r / s END AS psi FROM psi),
             |fit AS (SELECT w.seg, w.a, w.n, p2.psi,
             |    CAST(w.a + w.b AS DOUBLE) AS r1, CAST(w.a + w.c AS DOUBLE) AS c1,
             |    CAST(w.n AS DOUBLE) AS nn,
             |    1.0 - p2.psi AS qa,
             |    CAST(w.n AS DOUBLE) + (p2.psi - 1.0) * (CAST(w.a + w.b AS DOUBLE) + CAST(w.a + w.c AS DOUBLE)) AS qb,
             |    -p2.psi * CAST(w.a + w.b AS DOUBLE) * CAST(w.a + w.c AS DOUBLE) AS qc
             |  FROM w, p2),
             |roots AS (SELECT seg, a, n, psi, r1, c1, nn, qa, qb, qc,
             |    qb * qb - 4.0 * qa * qc AS disc FROM fit),
             |ea AS (SELECT seg, a, n, psi, r1, c1, nn,
             |    CASE WHEN psi IS NULL THEN NULL
             |      WHEN psi = 1.0 OR qa = 0.0 THEN
             |        CASE WHEN nn > 0 THEN r1 * c1 / nn END
             |      WHEN disc >= 0 AND (-qb + sqrt(disc)) / (2.0 * qa) >= GREATEST(0.0, r1 + c1 - nn)
             |        AND (-qb + sqrt(disc)) / (2.0 * qa) <= LEAST(r1, c1)
             |        THEN (-qb + sqrt(disc)) / (2.0 * qa)
             |      WHEN disc >= 0 AND (-qb - sqrt(disc)) / (2.0 * qa) >= GREATEST(0.0, r1 + c1 - nn)
             |        AND (-qb - sqrt(disc)) / (2.0 * qa) <= LEAST(r1, c1)
             |        THEN (-qb - sqrt(disc)) / (2.0 * qa)
             |    END AS ea
             |  FROM roots),
             |chk AS (SELECT seg, a, n, psi, ea,
             |    r1 - ea AS eb, c1 - ea AS ec, nn - r1 - c1 + ea AS ed
             |  FROM ea),
             |ok AS (SELECT seg, a, n, psi, ea, eb, ec, ed,
             |    ea IS NOT NULL AND ea > 0 AND eb > 0 AND ec > 0 AND ed > 0 AS ok
             |  FROM chk),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_strata,
             |    CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS k_degenerate,
             |    CAST(SUM(n) AS BIGINT) AS n,
             |    MAX(psi) AS or_mh,
             |    CAST(SUM(CASE WHEN ok THEN CAST(
             |      (CAST(a AS DOUBLE) - ea) * (CAST(a AS DOUBLE) - ea) *
             |        (1.0 / ea + 1.0 / eb + 1.0 / ec + 1.0 / ed)
             |      AS DECIMAL(28,12)) END) AS DOUBLE) AS chi2raw
             |  FROM ok)
             |SELECT k_strata, k_degenerate, n, or_mh,
             |  CASE WHEN or_mh IS NOT NULL THEN chi2raw END AS chi2,
             |  CASE WHEN k_strata - k_degenerate > 1
             |    THEN k_strata - k_degenerate - 1 END AS dof
             |FROM agg""".stripMargin)),

    // Yuen's 10%-trimmed robust A/B on view-vs-click values: trimmed
    // means + fence order statistics from the keyed prefix, winsorized
    // moments from one clamped row scan, Welch-Satterthwaite on the
    // trimmed counts.
    Q("q412_yuen",
      (s, dir) => graft.operators.Aggregations.yuenTrimmedT(
        Tables.events(s, dir), "event_type", "value", "view", "click",
        alpha = 0.1),
      Some("""WITH base AS (SELECT event_type AS g,
             |    CAST(value AS DECIMAL(18,2)) AS v
             |  FROM events WHERE event_type IN ('view','click')
             |    AND value IS NOT NULL),
             |c AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM base GROUP BY 1, 2),
             |cum AS (SELECT g, v, c,
             |    COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |    SUM(c) OVER (PARTITION BY g) AS n
             |  FROM c),
             |k AS (SELECT g, CAST(FLOOR(0.1 * CAST(MAX(n) AS DOUBLE)) AS BIGINT) AS k,
             |    CAST(MAX(n) AS BIGINT) AS n FROM cum GROUP BY g),
             |fl AS (SELECT cum.g,
             |    MAX(CASE WHEN s <= k.k AND k.k < s + c THEN v END) AS flo,
             |    MAX(CASE WHEN s <= k.n - k.k - 1 AND k.n - k.k - 1 < s + c THEN v END) AS fhi
             |  FROM cum JOIN k ON cum.g = k.g GROUP BY cum.g),
             |kept AS (SELECT cum.g,
             |    GREATEST(0, LEAST(s + c, k.n - k.k) - GREATEST(s, k.k)) AS w,
             |    v, k.n, k.k
             |  FROM cum JOIN k ON cum.g = k.g),
             |tm AS (SELECT g, CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
             |    CAST(SUM(CAST(w AS DECIMAL(19,0)) * v) AS DOUBLE) AS tsum
             |  FROM kept WHERE w > 0 GROUP BY g),
             |wm AS (SELECT base.g,
             |    CAST(SUM(LEAST(GREATEST(base.v, fl.flo), fl.fhi)) AS DOUBLE) AS sw,
             |    CAST(SUM(CAST(LEAST(GREATEST(base.v, fl.flo), fl.fhi) *
             |      LEAST(GREATEST(base.v, fl.flo), fl.fhi) AS DECIMAL(38,4))) AS DOUBLE) AS qw
             |  FROM base JOIN fl ON base.g = fl.g GROUP BY base.g),
             |per AS (SELECT tm.g, tm.n, tm.n - 2 * tm.k AS h,
             |    tm.tsum / CAST(tm.n - 2 * tm.k AS DOUBLE) AS tmean,
             |    CASE WHEN tm.n > 1
             |      THEN (wm.qw - wm.sw * wm.sw / CAST(tm.n AS DOUBLE)) /
             |        (CAST(tm.n AS DOUBLE) - 1.0) END AS s2w
             |  FROM tm JOIN wm ON tm.g = wm.g),
             |wide AS (SELECT
             |    MAX(CASE WHEN g = 'view' THEN n END) AS n_a,
             |    MAX(CASE WHEN g = 'click' THEN n END) AS n_b,
             |    MAX(CASE WHEN g = 'view' THEN h END) AS h_a,
             |    MAX(CASE WHEN g = 'click' THEN h END) AS h_b,
             |    MAX(CASE WHEN g = 'view' THEN tmean END) AS mean_a,
             |    MAX(CASE WHEN g = 'click' THEN tmean END) AS mean_b,
             |    MAX(CASE WHEN g = 'view' THEN s2w END) AS s2w_a,
             |    MAX(CASE WHEN g = 'click' THEN s2w END) AS s2w_b
             |  FROM per),
             |dd AS (SELECT *,
             |    CASE WHEN h_a > 1 THEN s2w_a * (CAST(n_a AS DOUBLE) - 1.0) /
             |      (CAST(h_a AS DOUBLE) * (CAST(h_a AS DOUBLE) - 1.0)) END AS da,
             |    CASE WHEN h_b > 1 THEN s2w_b * (CAST(n_b AS DOUBLE) - 1.0) /
             |      (CAST(h_b AS DOUBLE) * (CAST(h_b AS DOUBLE) - 1.0)) END AS db
             |  FROM wide)
             |SELECT n_a, n_b, h_a, h_b, mean_a, mean_b, s2w_a, s2w_b,
             |  mean_a - mean_b AS diff,
             |  CASE WHEN da + db > 0 THEN sqrt(da + db) END AS se,
             |  CASE WHEN da + db > 0 THEN (mean_a - mean_b) / sqrt(da + db) END AS t,
             |  CASE WHEN da + db > 0 AND h_a > 1 AND h_b > 1
             |    THEN (da + db) * (da + db) /
             |      (da * da / (CAST(h_a AS DOUBLE) - 1.0) +
             |       db * db / (CAST(h_b AS DOUBLE) - 1.0)) END AS dof
             |FROM dd""".stripMargin))
  )
}
