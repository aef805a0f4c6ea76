package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 49 (round 15, session 3): corpus text
  * analytics — the Zipf-fit corpus-shape diagnostic,
  * fingerprint-collision clustering, and exact Levenshtein-1 typo
  * pairs via FastSS deletion neighborhoods. (A PMI-collocation draft
  * was dropped: q180's Text.collocations already scores adjacent
  * bigrams with the monotone-equivalent lift form.)
  */
private[graft] object Batch49 {

  val queries: Seq[Q] = Seq(

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
    // unique tokens. The operator returns sorted member-id ARRAYS;
    // the gate EXPLODES them to one row per member — the driver's
    // pandas oracle compare cannot hash nested cells (the Q contract /
    // round-11 q199 incident, enforced by FlatOutputSpec).
    Q("q323_fingerprint_clusters",
      (s, dir) => graft.functions.Dedup.fingerprintClusters(
          Tables.documents(s, dir), "doc_id", "text", minSize = 2)
        .select(col("fp"), col("n_rows"), explode(col("ids")).as("member_id"))
        .orderBy("fp", "member_id"),
      Some("""WITH fp AS (SELECT doc_id,
             |    array_to_string(list_sort(list_distinct(list_filter(
             |      string_split(trim(regexp_replace(regexp_replace(lower(strip_accents(text)),
             |        '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0))), ' ') AS fp
             |  FROM documents),
             |g AS (SELECT fp, doc_id,
             |    CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_rows
             |  FROM fp WHERE fp IS NOT NULL AND length(fp) > 0)
             |SELECT fp, n_rows, doc_id AS member_id
             |FROM g WHERE n_rows >= 2 ORDER BY fp, member_id""".stripMargin)),

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
