package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 32 (round 12): drift & association statistics —
  * PSI, mutual information, Cramér's V, Mann–Whitney U — plus weighted
  * reservoir sampling and the token frequency spectrum.
  */
private[graft] object Batch32 {

  /** The q217 drifted hash-split fixture (shared by the KS / MWU / PSI
    * family so the three tests are comparable on ONE drift). */
  private def drifted(s: org.apache.spark.sql.SparkSession, dir: String,
                      salt: String, flooring: Boolean) = {
    val base = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("grp",
        when(graft.functions.Sampling.hashU32(col("event_id"), salt) <
          2147483648L, "ref").otherwise("cur"))
    val v = when(col("grp") === "cur" && col("event_id") % 3 === 0,
      col("value") * 2).otherwise(col("value"))
    base.withColumn("v", if (flooring) floor(v).cast("long") else v)
  }

  val queries: Seq[Q] = Seq(

    // PSI between the hash-split reference and the drifted slice: 20
    // equal-width bins over [0, 400), Laplace-smoothed shares, every
    // per-bin term replayed (the bin spine keeps empty bins in the sum
    // on both sides), decimal(28,12) term accumulation.
    Q("q226_psi_drift",
      (s, dir) => graft.operators.Analytics.psi(
        drifted(s, dir, "psi", flooring = false), "grp", "v",
        "ref", "cur", lo = 0.0, hi = 400.0, bins = 20),
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('psi' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'ref' ELSE 'cur' END AS grp, event_id, value
             |  FROM events WHERE event_type = 'purchase'),
             |vals AS (SELECT grp, CASE WHEN grp = 'cur' AND event_id % 3 = 0
             |    THEN value * 2 ELSE value END AS v FROM g),
             |b AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - 0.0) / (400.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bin, grp FROM vals),
             |c AS (SELECT bin,
             |    CAST(SUM(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM b GROUP BY bin),
             |spine AS (SELECT unnest(range(0, 20)) AS bin),
             |f AS (SELECT s.bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
             |  FROM spine s LEFT JOIN c ON s.bin = c.bin),
             |t AS (SELECT ca, cb, SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb FROM f),
             |terms AS (SELECT na, nb,
             |    CAST(((CAST(ca + 1 AS DOUBLE) / CAST(na + 20 AS DOUBLE)
             |         - CAST(cb + 1 AS DOUBLE) / CAST(nb + 20 AS DOUBLE))
             |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + 20 AS DOUBLE))
             |         / (CAST(cb + 1 AS DOUBLE) / CAST(nb + 20 AS DOUBLE)))) AS DECIMAL(28,12)) AS term
             |  FROM t)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CAST(SUM(term) AS DOUBLE) AS psi
             |FROM terms GROUP BY na, nb""".stripMargin)),

    // Mutual information between language and a length bucket —
    // dependence between two categorical views of the corpus: pair
    // counts, marginals, every log term, both entropies, and the NMI
    // chain replayed.
    Q("q227_mutual_info",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("lang"),
          floor(length(col("text")) / 200).cast("long").as("lenb"))
        graft.operators.Analytics.mutualInformation(d, "lang", "lenb")
      },
      Some("""WITH t AS (SELECT lang AS x, CAST(FLOOR(length(text) / 200) AS BIGINT) AS y FROM documents),
             |p AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY x, y),
             |mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM p GROUP BY x),
             |my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM p GROUP BY y),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM p),
             |mi AS (SELECT SUM(p.c) AS nn, CAST(SUM(CAST(
             |    (CAST(p.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(n.n AS DOUBLE) * CAST(p.c AS DOUBLE) / (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)))
             |  AS DECIMAL(28,12))) AS DOUBLE) AS mi
             |  FROM p JOIN mx ON p.x = mx.x JOIN my ON p.y = my.y CROSS JOIN n),
             |hx AS (SELECT CAST(-SUM(CAST((CAST(cx AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(cx AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h_x
             |  FROM mx CROSS JOIN n),
             |hy AS (SELECT CAST(-SUM(CAST((CAST(cy AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             |    ln(CAST(cy AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h_y
             |  FROM my CROSS JOIN n)
             |SELECT CAST(nn AS BIGINT) AS n, mi, h_x, h_y,
             |  CASE WHEN h_x > 0 AND h_y > 0 THEN mi / sqrt(h_x * h_y) END AS nmi
             |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin)),

    // Cramér's V between order status and priority — the full
    // contingency χ² via the zero-cell-free identity, then the bounded
    // effect size; counts, the Σc²/(cx·cy) decimal sum, and the pinned
    // χ²/V chain replayed.
    Q("q228_cramers_v",
      (s, dir) => graft.operators.Analytics.cramersV(
        Tables.orders(s, dir), "o_orderstatus", "o_orderpriority"),
      Some("""WITH p AS (SELECT o_orderstatus AS x, o_orderpriority AS y, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1, 2),
             |mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM p GROUP BY x),
             |my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM p GROUP BY y),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(COUNT(DISTINCT x) + MAX(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS rx,
             |    CAST(COUNT(DISTINCT y) + MAX(CASE WHEN y IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ry FROM p),
             |s AS (SELECT SUM(p.c) AS n2, tot.rx, tot.ry,
             |    SUM(CAST(CAST(p.c AS DOUBLE) * CAST(p.c AS DOUBLE) /
             |      (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)) AS DECIMAL(28,12))) AS ssum
             |  FROM p JOIN mx ON p.x = mx.x JOIN my ON p.y = my.y CROSS JOIN tot
             |  GROUP BY tot.rx, tot.ry)
             |SELECT CAST(n2 AS BIGINT) AS n, rx AS r_x, ry AS r_y,
             |  GREATEST(CAST(n2 AS DOUBLE) * CAST(ssum AS DOUBLE) - CAST(n2 AS DOUBLE), 0.0) AS chi2,
             |  CASE WHEN LEAST(rx, ry) > 1 THEN
             |    sqrt(GREATEST(CAST(n2 AS DOUBLE) * CAST(ssum AS DOUBLE) - CAST(n2 AS DOUBLE), 0.0)
             |      / (CAST(n2 AS DOUBLE) * CAST(LEAST(rx, ry) - 1 AS DOUBLE))) END AS v
             |FROM s""".stripMargin)),

    // Mann–Whitney U on the q217 KS fixture VERBATIM (same drift, same
    // forced ties) — rank-sum location test next to KS's max-gap test:
    // doubled rank-sums, the tie-correction Σ(t³−t), and the z chain
    // all replayed.
    Q("q229_mann_whitney",
      (s, dir) => graft.operators.Analytics.mannWhitneyU(
        drifted(s, dir, "ks", flooring = true), "grp", "v", "ref", "cur"),
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
             |    SUM(CAST(ca AS DECIMAL(38,0)) * (2 * before + t + 1)) AS r2a,
             |    SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties
             |  FROM cum),
             |ua AS (SELECT n_a, n_b,
             |    (CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0 AS u_a,
             |    CAST(ties AS DOUBLE) AS tiesd,
             |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn
             |  FROM agg)
             |SELECT n_a, n_b, u_a,
             |  CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) - u_a AS u_b,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND nn > 1 AND
             |      (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * ((nn + 1) - tiesd / (nn * (nn - 1)))) > 0
             |    THEN (u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) /
             |      sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * ((nn + 1) - tiesd / (nn * (nn - 1))))
             |  END AS z
             |FROM ua""".stripMargin)),

    // Weighted reservoir (A-Res): exactly 50 documents drawn
    // proportional-to-token-count without replacement — priorities are
    // the deterministic ln(u)/w with the salted-md5 uniform, so the
    // oracle recomputes every priority and the same top-50.
    Q("q230_weighted_reservoir",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"),
          graft.functions.Text.tokenCount(col("text")).cast("double").as("wt"))
        graft.functions.Sampling.weightedReservoir(d, "doc_id",
            col("wt"), k = 50, salt = "wr")
          .orderBy(col("priority").desc, col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0)) AS BIGINT) AS wt
             |  FROM documents),
             |p AS (SELECT doc_id, CAST(wt AS DOUBLE) AS wt,
             |    ln(CAST(CAST('0x' || substr(md5('wr' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1 AS DOUBLE)
             |       / 4294967296.0) / CAST(wt AS DOUBLE) AS priority
             |  FROM toks WHERE wt > 0)
             |SELECT doc_id, wt, priority FROM p
             |ORDER BY priority DESC, doc_id ASC LIMIT 50""".stripMargin)),

    // Token frequency spectrum (count-of-counts): the Zipf/hapax EDA
    // reduction — tokenize, per-type frequency, then the spectrum.
    // Two map-side-combined aggregates; both replayed exactly.
    Q("q231_freq_spectrum",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
        toks.groupBy("tok").agg(count(lit(1)).as("freq"))
          .groupBy("freq").agg(count(lit(1)).as("n_types"))
          .orderBy("freq")
      },
      Some("""WITH toks AS (SELECT unnest(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0)) AS tok FROM documents),
             |tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok)
             |SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_types
             |FROM tf GROUP BY freq ORDER BY freq""".stripMargin))
  )
}
