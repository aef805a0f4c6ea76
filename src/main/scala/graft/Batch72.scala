package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 72 (round 17, wave 4): the one-sample EDF
  * trio's L2 and tail-weighted members on the q409 hash-uniformity
  * fixture — Cramér–von Mises and Anderson–Darling against U(0,1) —
  * and embedding-space centroid drift.
  */
private[graft] object Batch72 {

  val queries: Seq[Q] = Seq(

    // Cramer-von Mises of the salted-hash fraction against U(0,1):
    // integrated-square departure; tied blocks via the exact
    // rank-interval closed forms in decimal(38,0).
    Q("q416_cvm_uniform",
      (s, dir) => graft.operators.Analytics.cvmUniformTest(
        Tables.events(s, dir).select(
          graft.functions.Sampling.hashFraction(col("event_id"), "ku")
            .as("u")),
        "u", 0.0, 1.0),
      Some("""WITH u AS (SELECT
             |    CAST(CAST('0x' || substr(md5('ku' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS v
             |  FROM events),
             |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1),
             |cum AS (SELECT v, c,
             |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a,
             |    SUM(c) OVER () AS n
             |  FROM c),
             |t AS (SELECT v, c, a, n,
             |    LEAST(GREATEST(v, 0.0), 1.0) AS f0,
             |    CAST(CAST(a + c AS DECIMAL(38,0)) * (a + c) -
             |      CAST(a AS DECIMAL(38,0)) * a AS DOUBLE) AS b1,
             |    CAST(CAST(a + c AS DECIMAL(38,0)) * (2 * (a + c) - 1) * (2 * (a + c) + 1) -
             |      CAST(a AS DECIMAL(38,0)) * (2 * a - 1) * (2 * a + 1) AS DOUBLE) / 3.0 AS b2
             |  FROM cum),
             |agg AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
             |    CAST(SUM(CAST(
             |      CAST(c AS DOUBLE) * f0 * f0 -
             |        f0 * b1 / CAST(n AS DOUBLE) +
             |        b2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |      AS DECIMAL(28,12))) AS DOUBLE) AS s
             |  FROM t)
             |SELECT n,
             |  CASE WHEN n > 0 THEN 1.0 / (12.0 * CAST(n AS DOUBLE)) + s END AS omega2
             |FROM agg""".stripMargin)),

    // Anderson-Darling of the same draws: tail-weighted EDF departure,
    // per-block integer rank sums for both log terms, boundary values
    // excluded and counted.
    Q("q417_ad_uniform",
      (s, dir) => graft.operators.Analytics.adUniformTest(
        Tables.events(s, dir).select(
          graft.functions.Sampling.hashFraction(col("event_id"), "ku")
            .as("u")),
        "u", 0.0, 1.0),
      Some("""WITH u AS (SELECT
             |    CAST(CAST('0x' || substr(md5('ku' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS v
             |  FROM events),
             |c0 AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1),
             |bnd AS (SELECT CAST(COALESCE(SUM(CASE WHEN v <= 0.0 OR v >= 1.0 THEN c ELSE 0 END), 0) AS BIGINT) AS n_boundary
             |  FROM c0),
             |c AS (SELECT v, c FROM c0 WHERE v > 0.0 AND v < 1.0),
             |cum AS (SELECT v, c,
             |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a,
             |    SUM(c) OVER () AS n
             |  FROM c),
             |t AS (SELECT v, c, a, n,
             |    CAST(CAST(a + c AS DECIMAL(38,0)) * (a + c) -
             |      CAST(a AS DECIMAL(38,0)) * a AS DOUBLE) AS b1,
             |    CAST(CAST(c AS DECIMAL(38,0)) * (2 * n + 1) -
             |      (CAST(a + c AS DECIMAL(38,0)) * (a + c + 1) -
             |       CAST(a AS DECIMAL(38,0)) * (a + 1)) AS DOUBLE) AS b2
             |  FROM cum),
             |agg AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
             |    CAST(SUM(CAST(
             |      (b1 * ln(v) + b2 * ln(1.0 - v)) / CAST(n AS DOUBLE)
             |      AS DECIMAL(28,12))) AS DOUBLE) AS s
             |  FROM t)
             |SELECT agg.n, bnd.n_boundary,
             |  CASE WHEN agg.n > 0 THEN -CAST(agg.n AS DOUBLE) - s END AS a2
             |FROM agg, bnd""".stripMargin)),

    // Embedding-space centroid drift between vec_id-parity cohorts:
    // exact decimal(12,9) per-dimension sums, pinned centroid cosine
    // and L2 gap - the representation-space "did the corpus move".
    Q("q418_centroid_drift",
      (s, dir) => graft.functions.Similarity.centroidDrift(
        Tables.embeddings(s, dir)
          .withColumn("snap",
            when(pmod(col("vec_id"), lit(2L)) === 0, "ref")
              .otherwise("cur")),
        "snap", "embedding", "ref", "cur"),
      Some("""WITH e AS (SELECT
             |    CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS g,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings),
             |sums AS (SELECT pos,
             |    CAST(SUM(CASE WHEN g = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             |    SUM(CASE WHEN g = 'ref' THEN vd END) AS sa,
             |    CAST(SUM(CASE WHEN g = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             |    SUM(CASE WHEN g = 'cur' THEN vd END) AS sb
             |  FROM e GROUP BY 1),
             |cent AS (SELECT pos, na, nb,
             |    CASE WHEN na > 0 THEN CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) END AS ca,
             |    CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) END AS cb
             |  FROM sums),
             |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS dim,
             |    CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |    CAST(SUM(CAST(ca * cb AS DECIMAL(28,12))) AS DOUBLE) AS dot,
             |    CAST(SUM(CAST(ca * ca AS DECIMAL(28,12))) AS DOUBLE) AS qa,
             |    CAST(SUM(CAST(cb * cb AS DECIMAL(28,12))) AS DOUBLE) AS qb,
             |    CAST(SUM(CAST((ca - cb) * (ca - cb) AS DECIMAL(28,12))) AS DOUBLE) AS l2q
             |  FROM cent)
             |SELECT dim, n_a, n_b,
             |  CASE WHEN qa > 0 AND qb > 0 THEN dot / (sqrt(qa) * sqrt(qb)) END AS cos_centroids,
             |  sqrt(l2q) AS l2_centroids
             |FROM agg""".stripMargin))
  )
}
