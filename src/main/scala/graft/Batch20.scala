package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 20 (round 11, sixth session, wave 11):
  * unicode canonical keys, bounded BFS, drift/AB statistics, and sparse
  * random projection.
  */
private[graft] object Batch20 {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)

  val queries: Seq[Q] = Seq(

    // Unicode canonical dedup key: accents are INJECTED deterministically
    // (translate aeiou → áéíóü — the fixture corpus is ASCII, so the
    // injection simulates the mixed-encoding web crawl this key exists
    // for), then canonicalKey = fold_accents → lowercase/collapse/trim
    // must both (a) emit the exact canonical string (hash-gated against
    // DuckDB's independent strip_accents implementation) and (b) round-
    // trip to the plain text's normalize() — the property that makes
    // cross-encoding scans of one page collapse to one exact-dedup key.
    Q("q195_canonical_key",
      (s, dir) => {
        val inj = docs(s, dir).select(col("doc_id"),
          translate(col("text"), "aeiou", "áéíóü").as("acc"),
          col("text"))
        inj.select(col("doc_id"),
            graft.functions.Text.canonicalKey(col("acc")).as("canon"),
            (graft.functions.Text.canonicalKey(col("acc")) ===
              graft.functions.Text.normalize(col("text"))).as("roundtrip"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(lower(strip_accents(
             |    translate(text, 'aeiou', 'áéíóü'))), '\s+', ' ', 'g')) AS canon,
             |  trim(regexp_replace(lower(strip_accents(
             |    translate(text, 'aeiou', 'áéíóü'))), '\s+', ' ', 'g')) =
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS roundtrip
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Bounded multi-source BFS over the co-purchase graph (q176's edge
    // set): seeds = parts with partkey % 97 = 0 at distance 0, frontier
    // expansion for 3 hops. The oracle is DuckDB's RECURSIVE CTE — an
    // independent fixpoint engine computing the same reachability — with
    // UNION (not UNION ALL) so each level dedups exactly like the
    // operator's settled-set anti-join.
    Q("q196_bfs_distances",
      (s, dir) => {
        val e = Tables.coPurchaseEdges(s, dir)
        val seeds = Tables.lineitem(s, dir)
          .select(col("l_partkey").as("node"))
          .filter(col("node") % 97 === 0).distinct()
        graft.functions.Graphs.bfsDistances(e, seeds, maxHops = 3)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE e0 AS (SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |e AS (SELECT i, j FROM e0 UNION ALL SELECT j AS i, i AS j FROM e0),
             |walk(node, d) AS (
             |  SELECT DISTINCT l_partkey, 0 FROM lineitem WHERE l_partkey % 97 = 0
             |  UNION
             |  SELECT e.j, walk.d + 1 FROM walk JOIN e ON e.i = walk.node
             |  WHERE walk.d < 3)
             |SELECT node, CAST(MIN(d) AS BIGINT) AS dist
             |FROM walk GROUP BY node ORDER BY node""".stripMargin)),

    // Chi-square distribution drift on the language column between a
    // hash-split reference snapshot and a current snapshot with injected
    // drift (every third German doc dropped). Counts are exact, expected/
    // term are pinned double ratios, chi2 is the decimal-exact sum of the
    // terms — the oracle replays category counts, expectations, every
    // term, the statistic, and the dof, so the whole monitor is gated.
    Q("q197_chisq_drift",
      (s, dir) => {
        val d = docs(s, dir)
        val u = graft.functions.Sampling.hashU32(col("doc_id"), "drift")
        val ref = d.filter(u < 2147483648L)
        val cur = d.filter(u >= 2147483648L)
          .filter(!(col("lang") === "de" && col("doc_id") % 3 === 0))
        graft.operators.Analytics.chiSquareDrift(ref, cur, "lang")
          .orderBy("cat")
      },
      Some("""WITH h AS (SELECT lang, doc_id,
             |    CAST('0x' || substr(md5('drift' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS u
             |  FROM documents),
             |r AS (SELECT lang AS cat, COUNT(*) AS n_ref FROM h
             |  WHERE u < 2147483648 GROUP BY 1),
             |c AS (SELECT lang AS cat, COUNT(*) AS n_cur FROM h
             |  WHERE u >= 2147483648 AND NOT (lang = 'de' AND doc_id % 3 = 0)
             |  GROUP BY 1),
             |j AS (SELECT COALESCE(r.cat, c.cat) AS cat,
             |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
             |  FROM r FULL OUTER JOIN c ON r.cat = c.cat),
             |t AS (SELECT cat, n_ref, n_cur,
             |    CASE WHEN n_ref > 0 THEN
             |      CAST(SUM(n_cur) OVER () AS DOUBLE) * CAST(n_ref AS DOUBLE)
             |        / CAST(SUM(n_ref) OVER () AS DOUBLE) END AS expected
             |  FROM j),
             |u AS (SELECT cat, n_ref, n_cur, expected,
             |    CASE WHEN n_ref > 0 THEN
             |      (CAST(n_cur AS DOUBLE) - expected) * (CAST(n_cur AS DOUBLE) - expected)
             |        / expected END AS term
             |  FROM t)
             |SELECT cat, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
             |  expected, term,
             |  CAST(SUM(CAST(term AS DECIMAL(28,12))) OVER () AS DOUBLE) AS chi2,
             |  CAST(SUM(CASE WHEN n_ref > 0 THEN 1 ELSE 0 END) OVER () - 1 AS BIGINT) AS dof,
             |  CAST(SUM(CASE WHEN n_ref = 0 THEN 1 ELSE 0 END) OVER () AS BIGINT) AS n_unseen
             |FROM u ORDER BY cat""".stripMargin)),

    // Welch's unequal-variance t-test between two hash-split variants of
    // order totals: exact decimal sufficient statistics (n, Σx, Σx² per
    // side in ONE map-side-combined pass), then the pinned double chain
    // mean → variance → t/t² → Welch–Satterthwaite dof that the oracle
    // replays op-for-op (sqrt is IEEE correctly-rounded in both engines).
    Q("q198_welch_ttest",
      (s, dir) => {
        val o = Tables.orders(s, dir).withColumn("grp",
          when(graft.functions.Sampling.hashU32(col("o_orderkey"), "ab") <
            2147483648L, "A").otherwise("B"))
        graft.operators.Analytics.welchT(o, "grp", "o_totalprice", "A", "B")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('ab' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'A' ELSE 'B' END AS grp,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS v
             |  FROM orders),
             |s AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN v END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN grp = 'A' THEN v * v END) AS DOUBLE) AS ssa,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN v END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN grp = 'B' THEN v * v END) AS DOUBLE) AS ssb
             |  FROM g),
             |m AS (SELECT n_a, n_b,
             |    sa / CAST(n_a AS DOUBLE) AS mean_a, sb / CAST(n_b AS DOUBLE) AS mean_b,
             |    CASE WHEN n_a >= 2 THEN (ssa - sa * sa / CAST(n_a AS DOUBLE))
             |      / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
             |    CASE WHEN n_b >= 2 THEN (ssb - sb * sb / CAST(n_b AS DOUBLE))
             |      / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
             |  FROM s),
             |w AS (SELECT *, var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) AS se2 FROM m)
             |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
             |  (mean_a - mean_b) / sqrt(se2) AS t,
             |  (mean_a - mean_b) * (mean_a - mean_b) / se2 AS t2,
             |  se2 * se2 / (
             |    (var_a / CAST(n_a AS DOUBLE)) * (var_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
             |    + (var_b / CAST(n_b AS DOUBLE)) * (var_b / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
             |  ) AS dof
             |FROM w""".stripMargin)),

    // Sparse random projection 64 → 8 dims: the deterministic Achlioptas
    // ±1/6 sign matrix is re-derived by the oracle from the same salted
    // md5 (sign = u mod 6 → {0:+1, 5:−1}), and each projected coordinate
    // is an exact decimal(12,9) signed sum — so the matrix derivation,
    // the fix9 image, and the projection sums are ALL under the gate.
    // Output is FLAT (vec_id, j, pv) scalar rows — the driver's pandas
    // oracle compare cannot hash array cells (registry-wide contract,
    // pinned by FlatOutputSpec), so the projected vector is exploded to
    // one row per coordinate rather than regrouped into a list.
    Q("q199_random_projection",
      (s, dir) => {
        graft.functions.ML.randomProjectSparse(
            Tables.embeddings(s, dir), "vec_id", "embedding",
            dim = 64, k = 8, salt = "rp")
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "pv")))
          .withColumn("j", col("j").cast("long"))
          .orderBy("vec_id", "j")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings),
             |s AS (SELECT j.j, i.i,
             |    CASE (CAST('0x' || substr(md5('rp:' || CAST(j.j AS VARCHAR) || ':'
             |        || CAST(i.i AS VARCHAR)), 1, 8) AS BIGINT) % 6)
             |      WHEN 0 THEN 1 WHEN 5 THEN -1 ELSE 0 END AS sg
             |  FROM (SELECT unnest(range(0, 8)) AS j) j
             |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i)
             |SELECT e.vec_id, s.j, CAST(SUM(e.vd * s.sg) AS DOUBLE) AS pv
             |FROM e JOIN s ON e.i = s.i GROUP BY 1, 2
             |ORDER BY vec_id, j""".stripMargin))
  )
}
