package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 46 (round 15, continued): the integral drift
  * statistic (exact 1-D Wasserstein-1, global + per-slice) beside the
  * sup statistic (ksTest), the parametric location test (Welch's t)
  * beside the rank one (Mann–Whitney), and probability-calibration
  * eval (Brier + ECE) beside the ranking eval (aucRoc/avgPrecision).
  */
private[graft] object Batch46 {

  val queries: Seq[Q] = Seq(

    // Exact W1 between a hash-split reference and a drifted current
    // slice on q217's fixture (values doubled for every third cur
    // event, floored to long so every CDF gap is integer-exact): dual
    // cumulatives + dense index from ONE distributed prefix, the
    // next-value equi-join, the |Fa−Fb|·gap terms, and the decimal sum
    // all replayed. The ×2 tail stretch is exactly the drift W1 is
    // built for: mass moved FAR counts in proportion to distance.
    Q("q281_wasserstein1",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.wasserstein1(ev, "grp", "v", "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CAST(FLOOR(CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY v),
             |cum AS (SELECT v,
             |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    LEAD(v) OVER (ORDER BY v) AS nv,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
             |  FROM c),
             |t AS (SELECT na, nb,
             |    CAST((CAST(ABS(CAST(cuma AS DECIMAL(38,0)) * nb
             |          - CAST(cumb AS DECIMAL(38,0)) * na) AS DOUBLE)
             |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             |      * (CAST(nv AS DOUBLE) - CAST(v AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM cum WHERE nv IS NOT NULL)
             |SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0
             |    THEN CAST(COALESCE(SUM(term), 0) AS DOUBLE) END AS w1
             |FROM t""".stripMargin)),

    // Per-event-type W1 on q274's fixture (ONLY the 'view' slice
    // shifted ×1.5): the sliced integral drift — the shifted slice's
    // w1 must stand far above the unshifted slices' sampling noise.
    // Keyed prefix, per-group next-value join, keyed totals spine.
    Q("q282_wasserstein1_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.wasserstein1By(ev, Seq("event_type"),
          "grp", "v", "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    value
             |  FROM events),
             |vals AS (SELECT event_type, grp,
             |    CAST(FLOOR(CASE WHEN grp = 'cur' AND event_type = 'view'
             |      THEN value * 1.5 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT event_type, v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1, 2),
             |cum AS (SELECT event_type, v,
             |    SUM(ca) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    LEAD(v) OVER (PARTITION BY event_type ORDER BY v) AS nv,
             |    SUM(ca) OVER (PARTITION BY event_type) AS na,
             |    SUM(cb) OVER (PARTITION BY event_type) AS nb
             |  FROM c),
             |t AS (SELECT event_type, na, nb,
             |    CAST((CAST(ABS(CAST(cuma AS DECIMAL(38,0)) * nb
             |          - CAST(cumb AS DECIMAL(38,0)) * na) AS DOUBLE)
             |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             |      * (CAST(nv AS DOUBLE) - CAST(v AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM cum WHERE nv IS NOT NULL)
             |SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_a,
             |  CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0
             |    THEN CAST(COALESCE(SUM(term), 0) AS DOUBLE) END AS w1
             |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Welch's t on q217's drift fixture (floored to long, so the
    // operator's decimal(18,2) quantization is lossless): the ×2 shift
    // on a third of cur moves the mean far outside sampling noise, so
    // |t| lands large. Moment sums, both variance identities, the t/t²
    // and Welch–Satterthwaite chains all replayed in pinned order
    // (q198's oracle shape on the drift fixture).
    Q("q283_welch_t_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.welchT(ev, "grp", "v", "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CAST(CAST(FLOOR(CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END) AS BIGINT) AS DECIMAL(18,2)) AS v FROM g),
             |st AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN v END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN v * v END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN v END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN v * v END) AS DOUBLE) AS ssb
             |  FROM vals),
             |m AS (SELECT n_a, n_b,
             |    CASE WHEN n_a > 0 THEN sa / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0 THEN sb / CAST(n_b AS DOUBLE) END AS mean_b,
             |    CASE WHEN n_a >= 2 THEN (ssa - sa * sa / CAST(n_a AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
             |    CASE WHEN n_b >= 2 THEN (ssb - sb * sb / CAST(n_b AS DOUBLE))
             |      / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
             |  FROM st),
             |w AS (SELECT *, var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) AS se2 FROM m)
             |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
             |  CASE WHEN se2 > 0 THEN (mean_a - mean_b) / sqrt(se2) END AS t,
             |  CASE WHEN se2 > 0 THEN (mean_a - mean_b) * (mean_a - mean_b) / se2 END AS t2,
             |  CASE WHEN se2 > 0 THEN se2 * se2 / (
             |    (var_a / CAST(n_a AS DOUBLE)) * (var_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
             |    + (var_b / CAST(n_b AS DOUBLE)) * (var_b / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
             |  ) END AS dof
             |FROM w""".stripMargin)),

    // Per-event-type Welch's t on q274's fixture — the sliced
    // parametric location test completing the sliced trio (shape:
    // ksTestBy, rank location: mannWhitneyUBy, mean location: this).
    // The ×1.5 'view'-only shift must show as one large-|t| slice.
    Q("q284_welch_t_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.welchTBy(ev, Seq("event_type"),
          "grp", "v", "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    value
             |  FROM events),
             |vals AS (SELECT event_type, grp,
             |    CAST(CAST(FLOOR(CASE WHEN grp = 'cur' AND event_type = 'view'
             |      THEN value * 1.5 ELSE value END) AS BIGINT) AS DECIMAL(18,2)) AS v FROM g),
             |st AS (SELECT event_type,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN v END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN v * v END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN v END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN v * v END) AS DOUBLE) AS ssb
             |  FROM vals GROUP BY 1),
             |m AS (SELECT event_type, n_a, n_b,
             |    CASE WHEN n_a > 0 THEN sa / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0 THEN sb / CAST(n_b AS DOUBLE) END AS mean_b,
             |    CASE WHEN n_a >= 2 THEN (ssa - sa * sa / CAST(n_a AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
             |    CASE WHEN n_b >= 2 THEN (ssb - sb * sb / CAST(n_b AS DOUBLE))
             |      / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
             |  FROM st),
             |w AS (SELECT *, var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) AS se2 FROM m)
             |SELECT event_type, n_a, n_b, mean_a, mean_b, var_a, var_b,
             |  CASE WHEN se2 > 0 THEN (mean_a - mean_b) / sqrt(se2) END AS t,
             |  CASE WHEN se2 > 0 THEN (mean_a - mean_b) * (mean_a - mean_b) / se2 END AS t2,
             |  CASE WHEN se2 > 0 THEN se2 * se2 / (
             |    (var_a / CAST(n_a AS DOUBLE)) * (var_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
             |    + (var_b / CAST(n_b AS DOUBLE)) * (var_b / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
             |  ) END AS dof
             |FROM w ORDER BY event_type""".stripMargin)),

    // Brier + ECE of a weak probability (value/200 clamped to [0,1])
    // against the value>55 label — monotone in the label driver, so
    // ranking metrics look fine while calibration is systematically
    // off: ECE lands well above 0. Per-row squared-error and per-bin
    // acc/conf terms, the bin clamp, and both divisions replayed.
    Q("q285_calibration",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("p", least(col("value") / 200, lit(1.0)))
        graft.functions.ML.calibration(ev, "p", col("value") > 55, bins = 10)
      },
      Some("""WITH s AS (SELECT LEAST(value / 200, 1.0) AS p,
             |    CASE WHEN value > 55 THEN 1.0 ELSE 0.0 END AS y
             |  FROM events WHERE event_type = 'purchase'),
             |b AS (SELECT p, y,
             |    LEAST(GREATEST(CAST(FLOOR(p * 10) AS BIGINT), 0), 9) AS bin FROM s),
             |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST((p - y) * (p - y) AS DECIMAL(28,12))) AS sbr FROM b),
             |c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
             |    SUM(CAST(y AS DECIMAL(28,12))) AS sy,
             |    SUM(CAST(p AS DECIMAL(28,12))) AS sp
             |  FROM b GROUP BY 1),
             |t AS (SELECT g.n, g.sbr,
             |    CAST((CAST(c.nb AS DOUBLE) / CAST(g.n AS DOUBLE)) *
             |      ABS(CAST(c.sy AS DOUBLE) / CAST(c.nb AS DOUBLE)
             |        - CAST(c.sp AS DOUBLE) / CAST(c.nb AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM c CROSS JOIN g)
             |SELECT MAX(n) AS n,
             |  CASE WHEN MAX(n) > 0 THEN CAST(MAX(sbr) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) END AS brier,
             |  CASE WHEN MAX(n) > 0 THEN CAST(SUM(term) AS DOUBLE) END AS ece
             |FROM t""".stripMargin)),

    // Per-event-type Brier + ECE — the sliced calibration audit: the
    // probability is fit to the pooled base rate, so slices whose
    // value distribution differs (purchase vs view vs click) expose
    // per-slice miscalibration the pooled q285 number averages away.
    Q("q286_calibration_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("p", least(col("value") / 200, lit(1.0)))
        graft.functions.ML.calibrationBy(ev, Seq("event_type"), "p",
          col("value") > 55, bins = 10).orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type, LEAST(value / 200, 1.0) AS p,
             |    CASE WHEN value > 55 THEN 1.0 ELSE 0.0 END AS y
             |  FROM events),
             |b AS (SELECT event_type, p, y,
             |    LEAST(GREATEST(CAST(FLOOR(p * 10) AS BIGINT), 0), 9) AS bin FROM s),
             |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST((p - y) * (p - y) AS DECIMAL(28,12))) AS sbr
             |  FROM b GROUP BY 1),
             |c AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS nb,
             |    SUM(CAST(y AS DECIMAL(28,12))) AS sy,
             |    SUM(CAST(p AS DECIMAL(28,12))) AS sp
             |  FROM b GROUP BY 1, 2),
             |t AS (SELECT c.event_type, g.n, g.sbr,
             |    CAST((CAST(c.nb AS DOUBLE) / CAST(g.n AS DOUBLE)) *
             |      ABS(CAST(c.sy AS DOUBLE) / CAST(c.nb AS DOUBLE)
             |        - CAST(c.sp AS DOUBLE) / CAST(c.nb AS DOUBLE)) AS DECIMAL(28,12)) AS term
             |  FROM c JOIN g ON c.event_type = g.event_type)
             |SELECT event_type, MAX(n) AS n,
             |  CASE WHEN MAX(n) > 0 THEN CAST(MAX(sbr) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) END AS brier,
             |  CASE WHEN MAX(n) > 0 THEN CAST(SUM(term) AS DOUBLE) END AS ece
             |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Jensen-Shannon divergence on q217's drift fixture — the bounded
    // symmetric drift score beside PSI's unbounded one, same truncated
    // bin tree / spine / Laplace smoothing, so the two gates share
    // everything but the per-bin term. Terms and decimal sum replayed.
    Q("q287_js_divergence",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value")))
        graft.operators.Analytics.jsDivergence(ev, "grp", "v", "ref", "cur",
          lo = 0.0, hi = 400.0, bins = 20)
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |v AS (SELECT grp, CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END AS v FROM g),
             |b AS (SELECT grp,
             |    LEAST(GREATEST(CAST(TRUNC((v - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin
             |  FROM v),
             |c AS (SELECT bin,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM b GROUP BY 1),
             |full0 AS (SELECT s.bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
             |  FROM (SELECT unnest(range(0, 20)) AS bin) s
             |  LEFT JOIN c ON c.bin = s.bin),
             |t AS (SELECT (SELECT SUM(ca) FROM full0) AS na,
             |    (SELECT SUM(cb) FROM full0) AS nb, ca, cb FROM full0),
             |p AS (SELECT na, nb,
             |    CAST(ca + 1 AS DOUBLE) / CAST(na + 20 AS DOUBLE) AS pa,
             |    CAST(cb + 1 AS DOUBLE) / CAST(nb + 20 AS DOUBLE) AS pb
             |  FROM t)
             |SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CAST(SUM(CAST((pa * ln(pa / ((pa + pb) / 2))
             |    + pb * ln(pb / ((pa + pb) / 2))) * 0.5 AS DECIMAL(28,12))) AS DOUBLE) AS jsd
             |FROM p""".stripMargin)),

    // Per-event-type JSD on q274's fixture — the sliced bounded drift:
    // the shifted 'view' slice must stand above the unshifted slices,
    // and every jsd must sit inside [0, ln 2] by construction.
    Q("q288_js_divergence_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value")))
        graft.operators.Analytics.jsDivergenceBy(ev, Seq("event_type"),
          "grp", "v", "ref", "cur", lo = 0.0, hi = 400.0, bins = 20)
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    value
             |  FROM events),
             |v AS (SELECT event_type, grp,
             |    CASE WHEN grp = 'cur' AND event_type = 'view' THEN value * 1.5
             |      ELSE value END AS v FROM g),
             |b AS (SELECT event_type, grp,
             |    LEAST(GREATEST(CAST(TRUNC((v - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin
             |  FROM v),
             |c AS (SELECT event_type, bin,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM b GROUP BY 1, 2),
             |spine AS (SELECT et.event_type, s.bin
             |  FROM (SELECT DISTINCT event_type FROM c) et
             |  CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) s),
             |full0 AS (SELECT sp.event_type, sp.bin,
             |    COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
             |  FROM spine sp LEFT JOIN c ON c.event_type = sp.event_type AND c.bin = sp.bin),
             |t AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb FROM full0 GROUP BY 1),
             |p AS (SELECT f.event_type, t.na, t.nb,
             |    CAST(f.ca + 1 AS DOUBLE) / CAST(t.na + 20 AS DOUBLE) AS pa,
             |    CAST(f.cb + 1 AS DOUBLE) / CAST(t.nb + 20 AS DOUBLE) AS pb
             |  FROM full0 f JOIN t ON f.event_type = t.event_type)
             |SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_a,
             |  CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CAST(SUM(CAST((pa * ln(pa / ((pa + pb) / 2))
             |    + pb * ln(pb / ((pa + pb) / 2))) * 0.5 AS DECIMAL(28,12))) AS DOUBLE) AS jsd
             |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // NDCG@10 per event_type: score = value, graded relevance =
    // event_id % 4 (deterministic, uncorrelated with the score by
    // construction, so ndcg lands strictly inside (0,1) and the
    // doc-id tie-break decides the digits). Both rankings, every
    // 2^rel / log2(r+1) term, the decimal sums, and the final
    // division replayed.
    Q("q289_ndcg_at_k",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("rel", (col("event_id") % 4).cast("long"))
        graft.functions.Retrieval.ndcgAtK(ev, "event_type", "event_id",
          "value", "rel", k = 10).orderBy("event_type")
      },
      Some("""WITH base AS (SELECT event_type, event_id AS doc, value AS score,
             |    CAST(event_id % 4 AS BIGINT) AS rel FROM events),
             |d AS (SELECT event_type, rel,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY score DESC, doc ASC) AS rn
             |  FROM base),
             |dc AS (SELECT event_type,
             |    SUM(CAST((POWER(2, CAST(rel AS DOUBLE)) - 1)
             |      / (LN(CAST(rn AS DOUBLE) + 1) / LN(2)) AS DECIMAL(28,12))) AS dcg
             |  FROM d WHERE rn <= 10 GROUP BY 1),
             |i AS (SELECT event_type, rel,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY rel DESC, doc ASC) AS rn
             |  FROM base),
             |ic AS (SELECT event_type,
             |    SUM(CAST((POWER(2, CAST(rel AS DOUBLE)) - 1)
             |      / (LN(CAST(rn AS DOUBLE) + 1) / LN(2)) AS DECIMAL(28,12))) AS idcg
             |  FROM i WHERE rn <= 10 GROUP BY 1)
             |SELECT dc.event_type, CAST(dc.dcg AS DOUBLE) AS dcg,
             |  CAST(ic.idcg AS DOUBLE) AS idcg,
             |  CASE WHEN ic.idcg > 0
             |    THEN CAST(dc.dcg AS DOUBLE) / CAST(ic.idcg AS DOUBLE) END AS ndcg
             |FROM dc JOIN ic ON dc.event_type = ic.event_type
             |ORDER BY dc.event_type""".stripMargin)),

    // Cramér-von Mises on q217's fixture VERBATIM — the weighted-L2
    // member beside KS (q217) and W1 (q281) on the SAME drift, so the
    // three gates triangulate one spine: cumulatives, the signed
    // cross-product, pooled-count weights, squared terms, decimal sum,
    // and the n_a·n_b/(n_a+n_b)² scaling all replayed.
    Q("q290_cramer_von_mises",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.cramerVonMises(ev, "grp", "v", "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CAST(FLOOR(CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY v),
             |cum AS (SELECT v, ca, cb,
             |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
             |  FROM c),
             |t AS (SELECT na, nb,
             |    CAST(CAST(ca + cb AS DOUBLE) * dd * dd AS DECIMAL(28,12)) AS term
             |  FROM (SELECT na, nb, ca, cb,
             |      CAST(CAST(cuma AS DECIMAL(38,0)) * nb
             |        - CAST(cumb AS DECIMAL(38,0)) * na AS DOUBLE)
             |        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS dd
             |    FROM cum))
             |SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0
             |    THEN CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE)
             |      / ((CAST(MAX(na) AS DOUBLE) + CAST(MAX(nb) AS DOUBLE))
             |        * (CAST(MAX(na) AS DOUBLE) + CAST(MAX(nb) AS DOUBLE)))
             |      * CAST(COALESCE(SUM(term), 0) AS DOUBLE) END AS cvm
             |FROM t""".stripMargin)),

    // Per-event-type Cramér-von Mises on q274's fixture — the fourth
    // sliced two-sample gauge on ONE fixture (psiBy q274, ksTestBy
    // q264's machinery, mannWhitneyUBy q275, wasserstein1By q282):
    // the 'view'-only shift must dominate here too.
    Q("q291_cramer_von_mises_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.cramerVonMisesBy(ev, Seq("event_type"),
          "grp", "v", "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    value
             |  FROM events),
             |vals AS (SELECT event_type, grp,
             |    CAST(FLOOR(CASE WHEN grp = 'cur' AND event_type = 'view'
             |      THEN value * 1.5 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT event_type, v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1, 2),
             |cum AS (SELECT event_type, v, ca, cb,
             |    SUM(ca) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    SUM(cb) OVER (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             |    SUM(ca) OVER (PARTITION BY event_type) AS na,
             |    SUM(cb) OVER (PARTITION BY event_type) AS nb
             |  FROM c),
             |t AS (SELECT event_type, na, nb,
             |    CAST(CAST(ca + cb AS DOUBLE) * dd * dd AS DECIMAL(28,12)) AS term
             |  FROM (SELECT event_type, na, nb, ca, cb,
             |      CAST(CAST(cuma AS DECIMAL(38,0)) * nb
             |        - CAST(cumb AS DECIMAL(38,0)) * na AS DOUBLE)
             |        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS dd
             |    FROM cum))
             |SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_a,
             |  CAST(MAX(nb) AS BIGINT) AS n_b,
             |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0
             |    THEN CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE)
             |      / ((CAST(MAX(na) AS DOUBLE) + CAST(MAX(nb) AS DOUBLE))
             |        * (CAST(MAX(na) AS DOUBLE) + CAST(MAX(nb) AS DOUBLE)))
             |      * CAST(COALESCE(SUM(term), 0) AS DOUBLE) END AS cvm
             |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Cliff's delta on q229's Mann-Whitney fixture VERBATIM — the
    // dominance effect size from the same doubled rank-sums: the z
    // says the drift is real, delta says HOW MUCH of the pair space
    // moved. The whole U chain plus the delta line replayed.
    Q("q292_cliffs_delta",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.cliffsDelta(ev, "grp", "v", "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CAST(FLOOR(CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY v),
             |cum AS (SELECT v, ca, cb, ca + cb AS t,
             |    COALESCE(SUM(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
             |  FROM c),
             |agg AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
             |    SUM(CAST(ca AS DECIMAL(38,0)) * (2 * before + t + 1)) AS r2a
             |  FROM cum),
             |ua AS (SELECT n_a, n_b,
             |    (CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0 AS u_a
             |  FROM agg)
             |SELECT n_a, n_b,
             |  CASE WHEN n_a > 0 AND n_b > 0
             |    THEN (2.0 * u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS delta
             |FROM ua""".stripMargin)),

    // Per-event-type Cliff's delta on q274's fixture — the sliced
    // effect size: q275's per-slice z flags the 'view' shift as real,
    // this quantifies its dominance while the unshifted slices sit
    // near 0.
    Q("q293_cliffs_delta_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value"))).cast("long"))
        graft.operators.Analytics.cliffsDeltaBy(ev, Seq("event_type"),
          "grp", "v", "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    value
             |  FROM events),
             |vals AS (SELECT event_type, grp,
             |    CAST(FLOOR(CASE WHEN grp = 'cur' AND event_type = 'view'
             |      THEN value * 1.5 ELSE value END) AS BIGINT) AS v FROM g),
             |c AS (SELECT event_type, v,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM vals GROUP BY 1, 2),
             |cum AS (SELECT event_type, v, ca, cb, ca + cb AS t,
             |    COALESCE(SUM(ca + cb) OVER (PARTITION BY event_type ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
             |  FROM c),
             |agg AS (SELECT event_type,
             |    CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
             |    SUM(CAST(ca AS DECIMAL(38,0)) * (2 * before + t + 1)) AS r2a
             |  FROM cum GROUP BY 1),
             |ua AS (SELECT event_type, n_a, n_b,
             |    (CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0 AS u_a
             |  FROM agg)
             |SELECT event_type, n_a, n_b,
             |  CASE WHEN n_a > 0 AND n_b > 0
             |    THEN (2.0 * u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS delta
             |FROM ua ORDER BY event_type""".stripMargin)),

    // Per-quantile drift report on q217's fixture — WHERE the ×2 tail
    // stretch lives: the low quantiles barely move while p90/p99 jump,
    // exactly the signature one number (KS/W1) cannot localize. Both
    // groups' exact interpolated quantiles (the q267 chain keyed on
    // grp) and every shift replayed.
    Q("q294_quantile_shift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ks") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            floor(when(col("grp") === "cur" && col("event_id") % 3 === 0,
              col("value") * 2).otherwise(col("value"))).cast("long"))
        graft.operators.Aggregations.quantileShift(ev, "grp", "v",
          "ref", "cur", Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CAST(FLOOR(CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END) AS BIGINT) AS v0 FROM g),
             |c AS (SELECT grp, CAST(v0 AS DOUBLE) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM vals GROUP BY 1, 2),
             |cum AS (SELECT grp, v, c,
             |  COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER (PARTITION BY grp) AS n FROM c),
             |p AS (SELECT unnest(CAST([0.1, 0.25, 0.5, 0.75, 0.9] AS DOUBLE[])) AS p),
             |lo AS (SELECT cum.grp, p.p, cum.n, cum.v AS vlo,
             |    p.p * (cum.n - 1) - FLOOR(p.p * (cum.n - 1)) AS frac
             |  FROM cum JOIN p ON cum.s <= CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT)
             |    AND CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) < cum.s + cum.c),
             |hi AS (SELECT cum.grp AS g2, p.p AS p2, cum.v AS vhi
             |  FROM cum JOIN p ON cum.s <= LEAST(CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) + 1, cum.n - 1)
             |    AND LEAST(CAST(FLOOR(p.p * (cum.n - 1)) AS BIGINT) + 1, cum.n - 1) < cum.s + cum.c),
             |q AS (SELECT lo.grp, lo.p, CAST(lo.n AS BIGINT) AS n,
             |    vlo + frac * (vhi - vlo) AS value
             |  FROM lo JOIN hi ON lo.grp = hi.g2 AND lo.p = hi.p2),
             |qa AS (SELECT p, n AS n_a, value AS q_a FROM q WHERE grp = 'ref'),
             |qb AS (SELECT p AS p2, n AS n_b, value AS q_b FROM q WHERE grp = 'cur')
             |SELECT COALESCE(qa.p, qb.p2) AS p, n_a, n_b, q_a, q_b,
             |  q_b - q_a AS shift
             |FROM qa FULL JOIN qb ON qa.p = qb.p2 ORDER BY p""".stripMargin)),

    // Binary-relevance retrieval eval per event_type: P@20 / R@20 /
    // reciprocal rank with the deterministic (score desc, doc asc)
    // ranking — the eval trio beside q289's graded NDCG. rel =
    // event_id % 7 (uncorrelated with the score), so every number
    // lands strictly between the degenerate 0/1 endpoints.
    Q("q295_retrieval_eval",
      (s, dir) => {
        graft.functions.Retrieval.retrievalEvalAtK(Tables.events(s, dir),
          "event_type", "event_id", "value", col("event_id") % 7 === 0,
          k = 20).orderBy("event_type")
      },
      Some("""WITH base AS (SELECT event_type, event_id AS doc, value AS score,
             |    CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS rel FROM events),
             |r AS (SELECT event_type, rel,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY score DESC, doc ASC) AS rn
             |  FROM base),
             |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(rel) AS BIGINT) AS n_rel,
             |    CAST(SUM(CASE WHEN rn <= 20 THEN rel ELSE 0 END) AS BIGINT) AS hits,
             |    MIN(CASE WHEN rel = 1 AND rn <= 20 THEN rn END) AS first
             |  FROM r GROUP BY 1)
             |SELECT event_type, n_docs, n_rel, hits,
             |  CAST(hits AS DOUBLE) / 20.0 AS p_at_k,
             |  CASE WHEN n_rel > 0 THEN CAST(hits AS DOUBLE) / CAST(n_rel AS DOUBLE) END AS r_at_k,
             |  CASE WHEN n_rel > 0 THEN COALESCE(1.0 / CAST(first AS DOUBLE), 0.0) END AS rr
             |FROM a ORDER BY event_type""".stripMargin)),

    // One-way ANOVA F across the five order priorities — the k-group
    // mean screen: per-group decimal moments, both sum-of-squares
    // identities, and the F chain replayed in pinned order. The value
    // is pre-scaled by 1e-6 (F is scale-invariant): v becomes an
    // 8-decimal-exact quantity below 1, so every double->decimal cast
    // sits far from a scale-12 rounding boundary and Spark's
    // exact-expansion rounding agrees with DuckDB's shortest-string
    // rounding on every row (a 2^-21 scaling was tried first and
    // produced dyadic decimals that land ON ties — 5 rows flipped).
    Q("q296_anova_f",
      (s, dir) => graft.operators.Analytics.oneWayF(
        Tables.orders(s, dir)
          .withColumn("v", col("o_totalprice") / 1000000),
        "o_orderpriority", "v"),
      Some("""WITH base AS (SELECT o_orderpriority AS grp, o_totalprice / 1000000 AS v
             |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
             |g AS (SELECT grp,
             |    CAST(COUNT(*) AS BIGINT) AS ng,
             |    SUM(CAST(v AS DECIMAL(28,12))) AS s1g,
             |    SUM(CAST(v * v AS DECIMAL(28,12))) AS s2g
             |  FROM base
             |  GROUP BY 1),
             |gt AS (SELECT grp, ng, s1g,
             |    CAST(s1g AS DOUBLE) * CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE) AS bt,
             |    CAST(s2g AS DOUBLE) - CAST(s1g AS DOUBLE) * CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE) AS wt
             |  FROM g),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
             |    SUM(s1g) AS s1,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(bt ORDER BY grp)), (x, y) -> x + y) AS b,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(wt ORDER BY grp)), (x, y) -> x + y) AS w
             |  FROM gt),
             |f AS (SELECT k, n,
             |    b - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
             |    w AS ssw FROM a)
             |SELECT k, n, ssb AS ss_between, ssw AS ss_within,
             |  CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
             |  CASE WHEN k > 1 AND n > k AND ssw > 0
             |    THEN (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)) END AS f
             |FROM f""".stripMargin)),

    // Brown-Forsythe variance homogeneity on the same (1e-6-scaled)
    // fixture — "did the SPREAD differ by priority": per-group exact
    // medians (the q267 interpolation chain, replayed manually — NOT
    // the engine's built-in percentile, so the median semantics stay
    // under the gate), |v − med| deviations, then the full ANOVA
    // chain on them.
    Q("q297_brown_forsythe",
      (s, dir) => graft.operators.Analytics.brownForsythe(
        Tables.orders(s, dir)
          .withColumn("v", col("o_totalprice") / 1000000),
        "o_orderpriority", "v"),
      Some("""WITH base AS (SELECT o_orderpriority AS grp, o_totalprice / 1000000 AS v
             |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
             |c AS (SELECT grp, CAST(v AS DOUBLE) AS v, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM base GROUP BY 1, 2),
             |cum AS (SELECT grp, v, c,
             |  COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
             |  SUM(c) OVER (PARTITION BY grp) AS n FROM c),
             |lo AS (SELECT grp, n, v AS vlo,
             |    0.5 * (n - 1) - FLOOR(0.5 * (n - 1)) AS frac
             |  FROM cum WHERE s <= CAST(FLOOR(0.5 * (n - 1)) AS BIGINT)
             |    AND CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) < s + c),
             |hi AS (SELECT grp AS g2, v AS vhi
             |  FROM cum WHERE s <= LEAST(CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1, n - 1)
             |    AND LEAST(CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1, n - 1) < s + c),
             |med AS (SELECT lo.grp, vlo + frac * (vhi - vlo) AS med
             |  FROM lo JOIN hi ON lo.grp = hi.g2),
             |z AS (SELECT base.grp, ABS(CAST(base.v AS DOUBLE) - med.med) AS z
             |  FROM base JOIN med ON base.grp = med.grp),
             |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
             |    SUM(CAST(z AS DECIMAL(28,12))) AS s1g,
             |    SUM(CAST(z * z AS DECIMAL(28,12))) AS s2g
             |  FROM z GROUP BY 1),
             |gt AS (SELECT grp, ng, s1g,
             |    CAST(s1g AS DOUBLE) * CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE) AS bt,
             |    CAST(s2g AS DOUBLE) - CAST(s1g AS DOUBLE) * CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE) AS wt
             |  FROM g),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
             |    SUM(s1g) AS s1,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(bt ORDER BY grp)), (x, y) -> x + y) AS b,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(wt ORDER BY grp)), (x, y) -> x + y) AS w
             |  FROM gt),
             |f AS (SELECT k, n,
             |    b - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
             |    w AS ssw FROM a)
             |SELECT k, n, ssb AS ss_between, ssw AS ss_within,
             |  CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
             |  CASE WHEN k > 1 AND n > k AND ssw > 0
             |    THEN (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)) END AS f
             |FROM f""".stripMargin)),

    // Confusion-matrix eval at one operating point: pred = score
    // threshold, label = value plus deterministic per-event noise —
    // correlated but imperfect, so tp/fp/fn/tn are all populated and
    // precision/recall/F1/MCC land strictly inside (0,1). Every count,
    // every ratio, the exact MCC cross-product, and the sqrt replayed.
    Q("q298_confusion_stats",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
        graft.functions.ML.confusionStats(ev,
          label = (col("value") + (col("event_id") % 20)) > 65,
          predicted = col("value") > 55)
      },
      Some("""WITH b AS (SELECT
             |    CASE WHEN value + (event_id % 20) > 65 THEN 1 ELSE 0 END AS lab,
             |    CASE WHEN value > 55 THEN 1 ELSE 0 END AS pred
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT
             |    CAST(SUM(CASE WHEN lab = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(SUM(CASE WHEN lab = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(SUM(CASE WHEN lab = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |    CAST(SUM(CASE WHEN lab = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
             |  FROM b),
             |m AS (SELECT *, tp + fp + fn + tn AS n,
             |    CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
             |    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
             |  FROM c)
             |SELECT CAST(n AS BIGINT) AS n, tp, fp, fn, tn, precision, recall,
             |  CASE WHEN precision + recall > 0
             |    THEN 2.0 * precision * recall / (precision + recall) END AS f1,
             |  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
             |    THEN CAST(CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
             |      / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
             |        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)) END AS mcc
             |FROM m""".stripMargin)),

    // Per-event-type confusion stats — the sliced operating point: the
    // threshold tuned on purchases runs against every slice's own
    // value profile, so per-slice precision/recall spread wide around
    // the pooled number.
    Q("q299_confusion_stats_by",
      (s, dir) => {
        graft.functions.ML.confusionStatsBy(Tables.events(s, dir),
          Seq("event_type"),
          label = (col("value") + (col("event_id") % 20)) > 65,
          predicted = col("value") > 55).orderBy("event_type")
      },
      Some("""WITH b AS (SELECT event_type,
             |    CASE WHEN value + (event_id % 20) > 65 THEN 1 ELSE 0 END AS lab,
             |    CASE WHEN value > 55 THEN 1 ELSE 0 END AS pred
             |  FROM events),
             |c AS (SELECT event_type,
             |    CAST(SUM(CASE WHEN lab = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(SUM(CASE WHEN lab = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(SUM(CASE WHEN lab = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |    CAST(SUM(CASE WHEN lab = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
             |  FROM b GROUP BY 1),
             |m AS (SELECT *, tp + fp + fn + tn AS n,
             |    CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
             |    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
             |  FROM c)
             |SELECT event_type, CAST(n AS BIGINT) AS n, tp, fp, fn, tn, precision, recall,
             |  CASE WHEN precision + recall > 0
             |    THEN 2.0 * precision * recall / (precision + recall) END AS f1,
             |  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
             |    THEN CAST(CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
             |      / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
             |        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)) END AS mcc
             |FROM m ORDER BY event_type""".stripMargin)),

    // Share-drift top movers: a hash-split reference vs a current
    // slice where every key ≡ 0 (mod 50) is REMAPPED to key 0 — key 0
    // absorbs three keys' mass (the top gainer by construction) while
    // keys 50/100/150 zero out (the top losers). Counts, broadcast
    // totals, both shares, the diff, and the (|diff| desc, key asc)
    // top-15 cut all replayed.
    Q("q300_share_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "sd") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("k",
            when(col("grp") === "cur" && col("user_id") % 50 === 0, 0L)
              .otherwise(col("user_id") % 200))
        graft.operators.Analytics.shareDrift(ev, "k", "grp",
          "ref", "cur", topN = 15)
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('sd' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp,
             |    user_id
             |  FROM events),
             |keyed AS (SELECT grp,
             |    CASE WHEN grp = 'cur' AND user_id % 50 = 0 THEN 0
             |      ELSE user_id % 200 END AS k FROM g),
             |c AS (SELECT k,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
             |  FROM keyed GROUP BY 1),
             |t AS (SELECT c.*, tt.na, tt.nb
             |  FROM c CROSS JOIN (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM c) tt),
             |sh AS (SELECT k, cnt_a, cnt_b,
             |    CASE WHEN na > 0 THEN CAST(cnt_a AS DOUBLE) / CAST(na AS DOUBLE) END AS share_a,
             |    CASE WHEN nb > 0 THEN CAST(cnt_b AS DOUBLE) / CAST(nb AS DOUBLE) END AS share_b
             |  FROM t)
             |SELECT CAST(k AS BIGINT) AS k, cnt_a, cnt_b, share_a, share_b,
             |  share_b - share_a AS diff
             |FROM sh ORDER BY ABS(share_b - share_a) DESC, k LIMIT 15""".stripMargin)),

    // Per-event-type daily-count ACF at lags 1..7 — the sliced
    // seasonality detector (q237 keyed): each slice centers on ITS OWN
    // mean (the pooled mean is the wrong centering for every slice).
    // Per-group means, denominators, lag joins, and divisions replayed.
    Q("q301_acf_daily_by",
      (s, dir) => {
        val series = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("d"))
          .agg(count(lit(1)).as("c"))
        graft.operators.TimeSeries.acfBy(series, Seq("event_type"),
          "d", "c", maxLag = 7)
      },
      Some("""WITH s AS (SELECT event_type, (epoch_us(ts) // 86400000000) AS d,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type,
             |    CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
             |  FROM s GROUP BY 1),
             |den AS (SELECT s.event_type,
             |    CAST(SUM(CAST((CAST(c AS DOUBLE) - m.mean) * (CAST(c AS DOUBLE) - m.mean) AS DECIMAL(28,12))) AS DOUBLE) AS den
             |  FROM s JOIN m ON s.event_type = m.event_type GROUP BY 1),
             |lags AS (SELECT unnest(range(1, 8)) AS lag),
             |num AS (SELECT a.event_type, l.lag,
             |    CAST(SUM(CAST((CAST(a.c AS DOUBLE) - m.mean) * (CAST(b.c AS DOUBLE) - m.mean) AS DECIMAL(28,12))) AS DOUBLE) AS num,
             |    CAST(COUNT(*) AS BIGINT) AS n_pairs
             |  FROM lags l JOIN s a ON TRUE
             |  JOIN s b ON b.event_type = a.event_type AND b.d = a.d + l.lag
             |  JOIN m ON m.event_type = a.event_type
             |  GROUP BY 1, 2)
             |SELECT num.event_type, CAST(num.lag AS BIGINT) AS lag, n_pairs,
             |  CASE WHEN den.den > 0 THEN num.num / den.den END AS acf
             |FROM num JOIN den ON num.event_type = den.event_type
             |ORDER BY num.event_type, lag""".stripMargin)),

    // Streaming windowed JSD on q232's drive VERBATIM — the bounded
    // symmetric live gauge beside the streaming PSI: same MemoryStream
    // day-windows, same reference histogram, same HistAgg state; only
    // the per-bin term differs, and the oracle replays it exactly.
    Q("q302_stream_jsd",
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
        val out = graft.streaming.Streams.windowedJsd(
          ms.toDS().toDF("ts_us", "value"), refCounts,
          lo = 0.0, hi = 400.0, watermark = "0 seconds", window_ = "1 day")
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName("q302_sink").start()
        try {
          ms.addData(rows.toSeq); q.processAllAvailable()
          ms.addData((flush, 0.0)); q.processAllAvailable()
        } finally q.stop()
        val maxBucket = rows.map(r => r._1 / dayUs * dayUs).max
        s.table("q302_sink").filter(col("bucket_us") <= maxBucket)
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
             |p AS (SELECT f.bucket_us, f.n,
             |    CAST(rc.rc + 1 AS DOUBLE) / CAST(nr.nr + 20 AS DOUBLE) AS pa,
             |    CAST(f.c + 1 AS DOUBLE) / CAST(f.n + 20 AS DOUBLE) AS pb
             |  FROM full0 f JOIN rc ON f.bin = rc.bin CROSS JOIN nr),
             |terms AS (SELECT bucket_us, n,
             |    CAST((pa * ln(pa / ((pa + pb) / 2))
             |      + pb * ln(pb / ((pa + pb) / 2))) * 0.5 AS DECIMAL(28,12)) AS term
             |  FROM p)
             |SELECT CAST(bucket_us AS BIGINT) AS bucket_us, CAST(n AS BIGINT) AS n,
             |  CAST(SUM(term) AS DOUBLE) AS jsd
             |FROM terms GROUP BY 1, 2 ORDER BY bucket_us""".stripMargin)),

    // Two-proportion z-test on an A/B fixture with a real injected
    // lift (cur values ×1.1 for every fourth event, success = v > 55):
    // counts, both rates, the pooled rate, the pooled-variance se, and
    // the z chain replayed in pinned order.
    Q("q303_prop_test",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ab2") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_id") % 4 === 0,
              col("value") * 1.1).otherwise(col("value")))
        graft.operators.Analytics.propTest(ev, "grp", col("v") > 55,
          "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ab2' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |v AS (SELECT grp, CASE WHEN grp = 'cur' AND event_id % 4 = 0
             |    THEN value * 1.1 ELSE value END AS v FROM g),
             |c AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'ref' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
             |  FROM v),
             |m AS (SELECT *,
             |    CASE WHEN n_a > 0 THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS p_a,
             |    CASE WHEN n_b > 0 THEN CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS p_b,
             |    CASE WHEN n_a + n_b > 0 THEN CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) END AS pp
             |  FROM c),
             |se AS (SELECT *, CASE WHEN n_a > 0 AND n_b > 0
             |    THEN pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) END AS se2
             |  FROM m)
             |SELECT n_a, n_b, x_a, x_b, p_a, p_b, p_a - p_b AS diff,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND se2 > 0
             |    THEN (p_a - p_b) / sqrt(se2) END AS z
             |FROM se""".stripMargin)),

    // Per-event-type two-proportion z on q274's fixture — the sliced
    // rate test: the ×1.5 'view'-only shift turns into a success-rate
    // lift in exactly one slice.
    Q("q304_prop_test_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value")))
        graft.operators.Analytics.propTestBy(ev, Seq("event_type"), "grp",
          col("v") > 55, "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, value
             |  FROM events),
             |v AS (SELECT event_type, grp, CASE WHEN grp = 'cur' AND event_type = 'view'
             |    THEN value * 1.5 ELSE value END AS v FROM g),
             |c AS (SELECT event_type,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'ref' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
             |  FROM v GROUP BY 1),
             |m AS (SELECT *,
             |    CASE WHEN n_a > 0 THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS p_a,
             |    CASE WHEN n_b > 0 THEN CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS p_b,
             |    CASE WHEN n_a + n_b > 0 THEN CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) END AS pp
             |  FROM c),
             |se AS (SELECT *, CASE WHEN n_a > 0 AND n_b > 0
             |    THEN pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) END AS se2
             |  FROM m)
             |SELECT event_type, n_a, n_b, x_a, x_b, p_a, p_b, p_a - p_b AS diff,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND se2 > 0
             |    THEN (p_a - p_b) / sqrt(se2) END AS z
             |FROM se ORDER BY event_type""".stripMargin)),

    // Haldane-Anscombe odds ratio + 95% Wald CI on q303's fixture —
    // the multiplicative effect size beside the z: every half-count
    // cell, the ratio, ln, the se chain, and both CI bounds replayed.
    Q("q305_odds_ratio",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ab2") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_id") % 4 === 0,
              col("value") * 1.1).otherwise(col("value")))
        graft.operators.Analytics.oddsRatio(ev, "grp", col("v") > 55,
          "ref", "cur")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ab2' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |v AS (SELECT grp, CASE WHEN grp = 'cur' AND event_id % 4 = 0
             |    THEN value * 1.1 ELSE value END AS v FROM g),
             |c AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'ref' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
             |  FROM v),
             |orr AS (SELECT *,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      (CAST(x_a AS DOUBLE) + 0.5) * (CAST(n_b - x_b AS DOUBLE) + 0.5)
             |        / ((CAST(n_a - x_a AS DOUBLE) + 0.5) * (CAST(x_b AS DOUBLE) + 0.5)) END AS odds_ratio,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      sqrt(1.0 / (CAST(x_a AS DOUBLE) + 0.5) + 1.0 / (CAST(n_a - x_a AS DOUBLE) + 0.5)
             |        + 1.0 / (CAST(x_b AS DOUBLE) + 0.5) + 1.0 / (CAST(n_b - x_b AS DOUBLE) + 0.5)) END AS se
             |  FROM c)
             |SELECT n_a, n_b, x_a, x_b, odds_ratio, LN(odds_ratio) AS log_or,
             |  EXP(LN(odds_ratio) - 1.96 * se) AS ci_lo,
             |  EXP(LN(odds_ratio) + 1.96 * se) AS ci_hi
             |FROM orr""".stripMargin)),

    // Per-event-type odds ratio on q274's fixture — the sliced
    // multiplicative effect: the shifted slice's CI excludes 1 by a
    // wide margin while the unshifted slices' CIs straddle it.
    Q("q306_odds_ratio_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "psiby") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_type") === "view",
              col("value") * 1.5).otherwise(col("value")))
        graft.operators.Analytics.oddsRatioBy(ev, Seq("event_type"), "grp",
          col("v") > 55, "ref", "cur").orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CASE WHEN
             |    CAST('0x' || substr(md5('psiby' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, value
             |  FROM events),
             |v AS (SELECT event_type, grp, CASE WHEN grp = 'cur' AND event_type = 'view'
             |    THEN value * 1.5 ELSE value END AS v FROM g),
             |c AS (SELECT event_type,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'ref' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(SUM(CASE WHEN grp = 'cur' AND v > 55 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
             |  FROM v GROUP BY 1),
             |orr AS (SELECT *,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      (CAST(x_a AS DOUBLE) + 0.5) * (CAST(n_b - x_b AS DOUBLE) + 0.5)
             |        / ((CAST(n_a - x_a AS DOUBLE) + 0.5) * (CAST(x_b AS DOUBLE) + 0.5)) END AS odds_ratio,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      sqrt(1.0 / (CAST(x_a AS DOUBLE) + 0.5) + 1.0 / (CAST(n_a - x_a AS DOUBLE) + 0.5)
             |        + 1.0 / (CAST(x_b AS DOUBLE) + 0.5) + 1.0 / (CAST(n_b - x_b AS DOUBLE) + 0.5)) END AS se
             |  FROM c)
             |SELECT event_type, n_a, n_b, x_a, x_b, odds_ratio,
             |  LN(odds_ratio) AS log_or,
             |  EXP(LN(odds_ratio) - 1.96 * se) AS ci_lo,
             |  EXP(LN(odds_ratio) + 1.96 * se) AS ci_hi
             |FROM orr ORDER BY event_type""".stripMargin)),

    // Cumulative-gains / decile lift table of q298's noisy-label score:
    // the correlated score gives a monotone-decreasing lift curve with
    // top-decile lift well above 1. The distributed rank (prefix block
    // starts + per-tie-block offsets), the integer bucket cut, the
    // spine, the cumulative, and every ratio replayed against a plain
    // ROW_NUMBER oracle — two rank constructions, one table.
    Q("q307_lift_table",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
        graft.functions.ML.liftTable(ev, "event_id", "value",
          (col("value") + (col("event_id") % 20)) > 65, buckets = 10)
      },
      Some("""WITH base AS (SELECT event_id AS id, value AS s,
             |    CASE WHEN value + (event_id % 20) > 65 THEN 1 ELSE 0 END AS y
             |  FROM events WHERE event_type = 'purchase'),
             |r AS (SELECT y, ROW_NUMBER() OVER (ORDER BY s DESC, id ASC) - 1 AS r FROM base),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS p FROM r),
             |pb AS (SELECT (r.r * 10) // t.n AS bucket,
             |    CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(y) AS BIGINT) AS pos
             |  FROM r CROSS JOIN t GROUP BY 1),
             |sp AS (SELECT s.bucket, COALESCE(pb.n_rows, 0) AS n_rows, COALESCE(pb.pos, 0) AS pos
             |  FROM (SELECT unnest(range(0, 10)) AS bucket) s
             |  LEFT JOIN pb ON pb.bucket = s.bucket),
             |cum AS (SELECT *, SUM(pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_pos
             |  FROM sp)
             |SELECT CAST(cum.bucket AS BIGINT) AS bucket, n_rows, pos,
             |  CASE WHEN n_rows > 0 THEN CAST(pos AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS rate,
             |  CAST(cum_pos AS BIGINT) AS cum_pos,
             |  CASE WHEN t.p > 0 THEN CAST(cum_pos AS DOUBLE) / CAST(t.p AS DOUBLE) END AS capture,
             |  CASE WHEN n_rows > 0 AND t.p > 0
             |    THEN (CAST(pos AS DOUBLE) / CAST(n_rows AS DOUBLE))
             |      / (CAST(t.p AS DOUBLE) / CAST(t.n AS DOUBLE)) END AS lift
             |FROM cum CROSS JOIN t ORDER BY bucket""".stripMargin)),

    // Categorical mix profile of the event-type column: exact shares,
    // entropy/normalized entropy/HHI, every share-based term and both
    // decimal sums replayed. Share-based terms keep every cast inside
    // the engine-replayable magnitude zone (see SCALE.md).
    Q("q308_categorical_profile",
      (s, dir) => graft.operators.Analytics.categoricalProfile(
        Tables.events(s, dir), "event_type"),
      Some("""WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
             |t AS (SELECT SUM(c) AS n FROM c),
             |p AS (SELECT CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS p, t.n
             |  FROM c CROSS JOIN t),
             |a AS (SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(CAST(-(p * ln(p)) AS DECIMAL(28,12))) AS DOUBLE) AS h,
             |    CAST(SUM(CAST(p * p AS DECIMAL(28,12))) AS DOUBLE) AS h2
             |  FROM p)
             |SELECT n, k, CASE WHEN n > 0 THEN h END AS entropy,
             |  CASE WHEN k > 1 THEN h / LN(CAST(k AS DOUBLE)) END AS norm_entropy,
             |  CASE WHEN n > 0 THEN h2 END AS hhi
             |FROM a""".stripMargin)),

    // Per-DAY event-type mix profile — the daily label-mix drift trace
    // (a day whose mix collapses toward one type shows as an entropy
    // dip / HHI spike): the keyed totals join and per-slice sums
    // replayed with GROUP BY day.
    Q("q309_categorical_profile_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("d", expr("ts div 86400000000000"))
        graft.operators.Analytics.categoricalProfileBy(ev, Seq("d"),
          "event_type").orderBy("d")
      },
      Some("""WITH c AS (SELECT (epoch_us(ts) // 86400000000) AS d, event_type,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT d, SUM(c) AS n FROM c GROUP BY 1),
             |p AS (SELECT c.d, CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS p, t.n
             |  FROM c JOIN t ON c.d = t.d),
             |a AS (SELECT d, CAST(MAX(n) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(CAST(-(p * ln(p)) AS DECIMAL(28,12))) AS DOUBLE) AS h,
             |    CAST(SUM(CAST(p * p AS DECIMAL(28,12))) AS DOUBLE) AS h2
             |  FROM p GROUP BY 1)
             |SELECT CAST(d AS BIGINT) AS d, n, k,
             |  CASE WHEN n > 0 THEN h END AS entropy,
             |  CASE WHEN k > 1 THEN h / LN(CAST(k AS DOUBLE)) END AS norm_entropy,
             |  CASE WHEN n > 0 THEN h2 END AS hhi
             |FROM a ORDER BY d""".stripMargin)),

    // Two-sample bootstrap mean difference on q303's lift fixture:
    // 8 replicates of mean(ref) - mean(cur) from ONE scan (the mixU32
    // fan-out with group-conditional sums). The oracle replays the
    // whole chain — md5 words, integer mixes, CDF inversion, both
    // conditional decimal sums, the means and the diff per replicate.
    Q("q310_bootstrap_mean_diff",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "ab2") <
              2147483648L, "ref").otherwise("cur"))
          .withColumn("v",
            when(col("grp") === "cur" && col("event_id") % 4 === 0,
              col("value") * 1.1).otherwise(col("value")))
          .withColumn("rid", col("event_id").cast("string"))
        graft.functions.ML.bootstrapMeanDiff(ev, "rid", "v", "grp",
          "ref", "cur", b = 8, salt = "bd")
      },
      Some("""WITH reps AS (SELECT unnest(range(0, 8)) AS rep),
             |g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ab2' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |h AS (SELECT grp = 'ref' AS ga,
             |    CAST(CASE WHEN grp = 'cur' AND event_id % 4 = 0
             |      THEN value * 1.1 ELSE value END AS DECIMAL(18,4)) AS v,
             |    CAST('0x' || substr(md5('bd' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
             |    CAST('0x' || substr(md5('bd' || CAST(event_id AS VARCHAR)), 9, 8) AS BIGINT) AS h2
             |  FROM g),
             |m0 AS (SELECT reps.rep, h.ga, h.v,
             |    xor(h.h1, (h.h2 + reps.rep * 2654435761) % 4294967296) AS x0
             |  FROM h CROSS JOIN reps),
             |m1 AS (SELECT rep, ga, v, (x0 * 1597334677) % 4294967296 AS x1 FROM m0),
             |m2 AS (SELECT rep, ga, v, (xor(x1, x1 >> 16) * 887987685) % 4294967296 AS x3 FROM m1),
             |r AS (SELECT rep, ga, v,
             |    CAST(xor(x3, x3 >> 13) AS DOUBLE) / 4294967296.0 AS u FROM m2),
             |w AS (SELECT rep, ga, v, CASE
             |    WHEN u < 0.36787944117144233 THEN 0
             |    WHEN u < 0.7357588823428847 THEN 1
             |    WHEN u < 0.9196986029286058 THEN 2
             |    WHEN u < 0.9810118431238462 THEN 3
             |    WHEN u < 0.9963401531726563 THEN 4
             |    WHEN u < 0.9994058151824183 THEN 5
             |    WHEN u < 0.9999167588507119 THEN 6
             |    WHEN u < 0.9999897508033253 THEN 7
             |    ELSE 8 END AS w FROM r),
             |a AS (SELECT rep,
             |    CAST(SUM(CASE WHEN ga THEN w ELSE 0 END) AS BIGINT) AS n_a,
             |    SUM(CASE WHEN ga THEN CAST(w AS DECIMAL(19,0)) * v END) AS sa,
             |    CAST(SUM(CASE WHEN NOT ga THEN w ELSE 0 END) AS BIGINT) AS n_b,
             |    SUM(CASE WHEN NOT ga THEN CAST(w AS DECIMAL(19,0)) * v END) AS sb
             |  FROM w GROUP BY rep),
             |m AS (SELECT rep, n_a, n_b,
             |    CASE WHEN n_a > 0 THEN CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
             |    CASE WHEN n_b > 0 THEN CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b
             |  FROM a)
             |SELECT CAST(rep AS BIGINT) AS rep, n_a, n_b, mean_a, mean_b,
             |  mean_a - mean_b AS diff
             |FROM m ORDER BY rep""".stripMargin)),

    // Per-event-type Kendall tau-b on bucketed axes — the sliced
    // ordinal association beside spearmanBy: per-slice pair counts,
    // the strictly x-ordered join, tie corrections, and the tau chain
    // all replayed with grouped SQL.
    Q("q311_kendall_tau_by",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("x", floor(col("value") / 10).cast("long"))
          .withColumn("y",
            (floor(col("value") / 20) + col("event_id") % 3).cast("long"))
        graft.operators.Analytics.kendallTauBy(ev, Seq("event_type"),
          "x", "y").orderBy("event_type")
      },
      Some("""WITH base AS (SELECT event_type AS k,
             |    CAST(FLOOR(value / 10) AS BIGINT) AS x,
             |    CAST(FLOOR(value / 20) + (event_id % 3) AS BIGINT) AS y
             |  FROM events),
             |p AS (SELECT k, x, y, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM base GROUP BY 1, 2, 3),
             |cd AS (SELECT a.k,
             |    SUM(CASE WHEN b.y > a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c
             |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS nc,
             |    SUM(CASE WHEN b.y < a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c
             |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS nd
             |  FROM p a JOIN p b ON a.k = b.k AND b.x > a.x GROUP BY 1),
             |tx AS (SELECT k, SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t
             |  FROM (SELECT k, x, SUM(c) AS s FROM p GROUP BY 1, 2) GROUP BY 1),
             |ty AS (SELECT k, SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t
             |  FROM (SELECT k, y, SUM(c) AS s FROM p GROUP BY 1, 2) GROUP BY 1),
             |tot AS (SELECT k, CAST(SUM(c) AS BIGINT) AS n FROM p GROUP BY 1),
             |f AS (SELECT tot.k, tot.n,
             |    CAST(cd.nc AS DOUBLE) AS nc, CAST(cd.nd AS DOUBLE) AS nd,
             |    CAST(tot.n AS DOUBLE) * (CAST(tot.n AS DOUBLE) - 1) / 2.0 AS n0,
             |    CAST(tx.t AS DOUBLE) AS txd, CAST(ty.t AS DOUBLE) AS tyd
             |  FROM tot LEFT JOIN cd ON tot.k = cd.k
             |  JOIN tx ON tot.k = tx.k JOIN ty ON tot.k = ty.k)
             |SELECT k AS event_type, n, nc, nd,
             |  CASE WHEN n0 - txd / 2.0 > 0 AND n0 - tyd / 2.0 > 0
             |    THEN (nc - nd) / sqrt((n0 - txd / 2.0) * (n0 - tyd / 2.0)) END AS tau_b
             |FROM f ORDER BY event_type""".stripMargin)),

    // Per-document type-token ratio + hapax share over the documents
    // corpus: the tokenizer (the q98/BM25 contract), per-(doc, type)
    // counts, all three totals, and both ratio divisions replayed.
    Q("q312_lexical_diversity",
      (s, dir) => graft.functions.Text.lexicalDiversity(
        Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id,
             |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
             |  FROM documents),
             |tt AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM toks WHERE len(t) > 0 GROUP BY 1, 2),
             |pd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |    CAST(COUNT(*) AS BIGINT) AS n_types,
             |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
             |  FROM tt GROUP BY 1)
             |SELECT d.doc_id, COALESCE(pd.n_tokens, 0) AS n_tokens,
             |  COALESCE(pd.n_types, 0) AS n_types,
             |  COALESCE(pd.n_hapax, 0) AS n_hapax,
             |  CASE WHEN COALESCE(pd.n_tokens, 0) > 0
             |    THEN CAST(pd.n_types AS DOUBLE) / CAST(pd.n_tokens AS DOUBLE) END AS ttr,
             |  CASE WHEN COALESCE(pd.n_types, 0) > 0
             |    THEN CAST(pd.n_hapax AS DOUBLE) / CAST(pd.n_types AS DOUBLE) END AS hapax_share
             |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
             |ORDER BY d.doc_id""".stripMargin))
  )
}
