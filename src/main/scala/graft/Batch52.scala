package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 52 (round 15, session 3): the dominant
  * principal component (estimator-gated — the q257/q268 discipline:
  * replayable statistics exact, the iterative eigenpair certified by
  * in-query invariants) and the per-slice cumulative-gains report.
  */
private[graft] object Batch52 {

  val queries: Seq[Q] = Seq(

    // Top PC over the first four (integerized) embedding dimensions.
    // The gate hashes what is exactly replayable — n-backed per-dim
    // VARIANCE through the pinned covariance chain — plus the
    // eigenpair's certificates: resid_ok (power iteration actually
    // converged: ||Cv - lambda*v||inf small) and bounds_ok (Rayleigh:
    // max variance <= lambda <= trace), both pinned TRUE by the
    // oracle. The loadings themselves are approximate-by-nature and
    // deliberately NOT hashed.
    Q("q329_top_pc",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .filter(col("embedding").isNotNull && size(col("embedding")) >= 4)
          .select((0 until 4).map(i =>
            expr(s"cast(floor(cast(element_at(embedding, ${i + 1}) as double) * 1000) as bigint)")
              .as(s"e$i")): _*)
        graft.functions.ML.topPrincipalComponent(e,
            Seq("e0", "e1", "e2", "e3"))
          .select("dim", "variance", "resid_ok", "bounds_ok")
          .orderBy("dim")
      },
      Some("""WITH e AS (SELECT list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS emb
             |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) >= 4),
             |x AS (SELECT CAST(emb[1] AS DECIMAL(18,4)) AS e0, CAST(emb[2] AS DECIMAL(18,4)) AS e1,
             |    CAST(emb[3] AS DECIMAL(18,4)) AS e2, CAST(emb[4] AS DECIMAL(18,4)) AS e3 FROM e),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(e0) AS DOUBLE) AS s0, CAST(SUM(e1) AS DOUBLE) AS s1,
             |    CAST(SUM(e2) AS DOUBLE) AS s2, CAST(SUM(e3) AS DOUBLE) AS s3,
             |    CAST(SUM(e0 * e0) AS DOUBLE) AS p0, CAST(SUM(e1 * e1) AS DOUBLE) AS p1,
             |    CAST(SUM(e2 * e2) AS DOUBLE) AS p2, CAST(SUM(e3 * e3) AS DOUBLE) AS p3
             |  FROM x),
             |v AS (SELECT * FROM (
             |  SELECT 'e0' AS dim, (CAST(n AS DOUBLE) * p0 - s0 * s0) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS variance FROM a
             |  UNION ALL SELECT 'e1', (CAST(n AS DOUBLE) * p1 - s1 * s1) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) FROM a
             |  UNION ALL SELECT 'e2', (CAST(n AS DOUBLE) * p2 - s2 * s2) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) FROM a
             |  UNION ALL SELECT 'e3', (CAST(n AS DOUBLE) * p3 - s3 * s3) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) FROM a))
             |SELECT dim, variance, TRUE AS resid_ok, TRUE AS bounds_ok
             |FROM v ORDER BY dim""".stripMargin)),

    // Per-event-type cumulative-gains table at 5 buckets: the q307
    // report sliced — keyed distributed-prefix block starts, per-key
    // totals, per-key bucket spine. The oracle replays the whole rank
    // construction with a keyed ROW_NUMBER — two rank constructions,
    // one table, per slice.
    Q("q330_lift_table_by",
      (s, dir) => graft.functions.ML.liftTableBy(
        Tables.events(s, dir), Seq("event_type"), "event_id", "value",
        col("event_id") % 7 === 0, buckets = 5),
      Some("""WITH base AS (SELECT event_type, event_id AS id, value AS score,
             |    CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS y FROM events),
             |r AS (SELECT event_type, y,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY score DESC, id ASC) - 1 AS r,
             |    COUNT(*) OVER (PARTITION BY event_type) AS n,
             |    SUM(y) OVER (PARTITION BY event_type) AS p
             |  FROM base),
             |b AS (SELECT event_type, (r * 5) // n AS bucket,
             |    CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(y) AS BIGINT) AS pos,
             |    MAX(n) AS n, MAX(p) AS p
             |  FROM r GROUP BY 1, 2),
             |c AS (SELECT *, SUM(pos) OVER (PARTITION BY event_type ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM b)
             |SELECT event_type, CAST(bucket AS BIGINT) AS bucket, n_rows, pos,
             |  CASE WHEN n_rows > 0 THEN CAST(pos AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS rate,
             |  CAST(cum AS BIGINT) AS cum_pos,
             |  CASE WHEN p > 0 THEN CAST(cum AS DOUBLE) / CAST(p AS DOUBLE) END AS capture,
             |  CASE WHEN n_rows > 0 AND p > 0
             |    THEN (CAST(pos AS DOUBLE) / CAST(n_rows AS DOUBLE)) / (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) END AS lift
             |FROM c ORDER BY event_type, bucket""".stripMargin)),
  )
}
