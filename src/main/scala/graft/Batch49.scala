package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 49 (round 15, session 3): corpus text
  * analytics — PMI collocations, the Zipf-fit corpus-shape diagnostic,
  * fingerprint-collision clustering, and exact Levenshtein-1 typo
  * pairs via FastSS deletion neighborhoods.
  */
private[graft] object Batch49 {

  val queries: Seq[Q] = Seq(

    // Statistically-bound word pairs: adjacent-bigram PMI with the
    // left/right bigram-event marginals, c >= 3 floor, deterministic
    // (pmi desc, w1, w2) top-30. The oracle replays q260's tokenize +
    // zipped-position bigram chain, both marginals, and the single
    // pinned ln.
    Q("q321_pmi_collocations",
      (s, dir) => graft.functions.Text.pmiCollocations(
        Tables.documents(s, dir), "doc_id", "text",
        minCount = 3, topN = 30),
      Some("""WITH lists AS (SELECT doc_id,
             |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0) AS l FROM documents),
             |toks AS (SELECT doc_id, unnest(l) AS tok,
             |    CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos FROM lists),
             |bg AS (SELECT a.tok AS w1, b.tok AS w2
             |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
             |c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
             |cl AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cl FROM c12 GROUP BY 1),
             |cr AS (SELECT w2, CAST(SUM(c) AS BIGINT) AS cr FROM c12 GROUP BY 1),
             |nb AS (SELECT CAST(SUM(c) AS BIGINT) AS nb FROM c12)
             |SELECT c12.w1, c12.w2, c AS c_pair, cl AS c_left, cr AS c_right,
             |  nb AS n_bigrams,
             |  ln(CAST(c AS DOUBLE) * CAST(nb AS DOUBLE) /
             |    (CAST(cl AS DOUBLE) * CAST(cr AS DOUBLE))) AS pmi
             |FROM c12 JOIN cl ON c12.w1 = cl.w1 JOIN cr ON c12.w2 = cr.w2
             |  CROSS JOIN nb
             |WHERE c >= 3
             |ORDER BY pmi DESC, c12.w1, c12.w2 LIMIT 30""".stripMargin)),

    // Zipf fit over frequency classes (weighted LS of ln f on
    // ln midrank): the distinct-frequency prefix, both log chains,
    // and the f-ordered cross-class folds all replayed. Natural-ish
    // synthetic text lands near slope -1; template spam would not.
    Q("q322_zipf_slope",
      (s, dir) => graft.functions.Text.zipfSlope(
        Tables.documents(s, dir), "text"),
      Some("""WITH lists AS (SELECT doc_id,
             |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0) AS l FROM documents),
             |toks AS (SELECT unnest(l) AS tok FROM lists),
             |tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY 1),
             |cls AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS m FROM tf GROUP BY 1),
             |cum AS (SELECT f, m,
             |    COALESCE(SUM(m) OVER (ORDER BY f DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rb
             |  FROM cls),
             |t AS (SELECT f, m,
             |    ln(CAST(rb AS DOUBLE) + (CAST(m AS DOUBLE) + 1.0) / 2.0) AS x,
             |    ln(CAST(f AS DOUBLE)) AS y
             |  FROM cum),
             |a AS (SELECT CAST(SUM(CAST(f AS DECIMAL(38,0)) * m) AS BIGINT) AS n_tokens,
             |    CAST(SUM(m) AS BIGINT) AS n_types, CAST(COUNT(*) AS BIGINT) AS n_classes,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(CAST(m AS DOUBLE) * x ORDER BY f)), (p, q) -> p + q) AS sx,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(CAST(m AS DOUBLE) * y ORDER BY f)), (p, q) -> p + q) AS sy,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(CAST(m AS DOUBLE) * x * x ORDER BY f)), (p, q) -> p + q) AS sxx,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), LIST(CAST(m AS DOUBLE) * x * y ORDER BY f)), (p, q) -> p + q) AS sxy
             |  FROM t),
             |d AS (SELECT *, CAST(n_types AS DOUBLE) AS w,
             |    sxx - sx * sx / CAST(n_types AS DOUBLE) AS den FROM a),
             |sl AS (SELECT *, CASE WHEN n_classes > 1 AND den > 0
             |    THEN (sxy - sx * sy / w) / den END AS slope FROM d)
             |SELECT n_tokens, n_types, n_classes, slope,
             |  CASE WHEN slope IS NOT NULL THEN (sy - slope * sx) / w END AS intercept
             |FROM sl""".stripMargin)),

    // Fingerprint-collision clusters over the corpus (21 clusters at
    // sf0.01 — the near-dup structure surfaces as token-set
    // collisions): accent fold, lowercase, ASCII-alnum strip, sorted
    // unique tokens; sorted member ids per cluster.
    Q("q323_fingerprint_clusters",
      (s, dir) => graft.functions.Dedup.fingerprintClusters(
          Tables.documents(s, dir), "doc_id", "text", minSize = 2)
        .orderBy("fp"),
      Some("""WITH fp AS (SELECT doc_id,
             |    array_to_string(list_sort(list_distinct(list_filter(
             |      string_split(trim(regexp_replace(regexp_replace(lower(strip_accents(text)),
             |        '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0))), ' ') AS fp
             |  FROM documents)
             |SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  LIST(doc_id ORDER BY doc_id) AS ids
             |FROM fp WHERE fp IS NOT NULL AND length(fp) > 0
             |GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY fp""".stripMargin)),

    // Levenshtein-1 pairs over supplier names (FastSS deletion
    // neighborhoods + exact verify — the oracle brute-forces all C(n,2)
    // pairs, which the operator must reproduce WITHOUT the cartesian
    // product; 900 pairs at sf0.01 from single-digit substitutions).
    Q("q324_lev_pairs",
      (s, dir) => graft.functions.Dedup.levPairsD1(
          Tables.supplier(s, dir), "s_suppkey", "s_name")
        .orderBy("id1", "id2"),
      Some("""WITH s AS (SELECT s_suppkey, s_name FROM supplier
             |  WHERE s_name IS NOT NULL AND length(s_name) >= 2)
             |SELECT a.s_suppkey AS id1, b.s_suppkey AS id2,
             |  a.s_name AS s1, b.s_name AS s2,
             |  CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
             |FROM s a JOIN s b ON a.s_suppkey < b.s_suppkey
             |WHERE levenshtein(a.s_name, b.s_name) <= 1
             |ORDER BY id1, id2""".stripMargin)),
  )
}
