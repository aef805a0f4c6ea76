package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 36 (round 12): personalized PageRank and the
  * Poisson bootstrap.
  */
private[graft] object Batch36 {

  val queries: Seq[Q] = Seq(

    // Personalized PageRank from three user seeds over the user→page
    // graph, 3 iterations, d = 0.85: seed-restricted teleport, per-edge
    // contribution division, decimal contribution sums, and every
    // iteration's pinned damping expression replayed (the q160 unrolled
    // oracle with the seed-indicator teleport). Zero-rank nodes are
    // filtered on both sides (the seeds' forward-reachable set is the
    // interesting output).
    Q("q239_personalized_pagerank",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val edges = ev.select(
          concat(lit("u"), col("user_id").cast("string")).as("src"),
          concat(lit("p"), pmod(col("event_id"), lit(100L)).cast("string")).as("dst"))
        graft.functions.Graphs.personalizedPageRank(edges, "src", "dst",
            seeds = Seq("u1", "u2", "u3"), iters = 3)
          .filter(col("rank") > 0)
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
             |    'p' || CAST(event_id % 100 AS VARCHAR) AS dst FROM events),
             |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
             |od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
             |r0 AS (SELECT node, CASE WHEN node IN ('u1', 'u2', 'u3') THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank FROM nodes),
             |c1 AS (SELECT e.dst AS node, SUM(CAST(r.rank / od.outdeg AS DECIMAL(28,15))) AS s
             |  FROM e JOIN r0 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
             |r1 AS (SELECT n.node, (CASE WHEN n.node IN ('u1', 'u2', 'u3') THEN 1.0 - 0.85 ELSE 0.0 END) + 0.85 * COALESCE(CAST(c1.s AS DOUBLE), 0.0) AS rank
             |  FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
             |c2 AS (SELECT e.dst AS node, SUM(CAST(r.rank / od.outdeg AS DECIMAL(28,15))) AS s
             |  FROM e JOIN r1 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
             |r2 AS (SELECT n.node, (CASE WHEN n.node IN ('u1', 'u2', 'u3') THEN 1.0 - 0.85 ELSE 0.0 END) + 0.85 * COALESCE(CAST(c2.s AS DOUBLE), 0.0) AS rank
             |  FROM nodes n LEFT JOIN c2 ON c2.node = n.node),
             |c3 AS (SELECT e.dst AS node, SUM(CAST(r.rank / od.outdeg AS DECIMAL(28,15))) AS s
             |  FROM e JOIN r2 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
             |r3 AS (SELECT n.node, (CASE WHEN n.node IN ('u1', 'u2', 'u3') THEN 1.0 - 0.85 ELSE 0.0 END) + 0.85 * COALESCE(CAST(c3.s AS DOUBLE), 0.0) AS rank
             |  FROM nodes n LEFT JOIN c3 ON c3.node = n.node)
             |SELECT node, rank FROM r3 WHERE rank > 0 ORDER BY node""".stripMargin)),

    // Poisson bootstrap: 16 deterministic resampled means of
    // l_quantity out of ONE scan (2×16 combined aggregate expressions).
    // ONE md5 per row (the two 32-bit words) fanned into 16 uniforms by
    // the mixU32 integer finalizer — the oracle replays the full chain
    // in signed-BIGINT arithmetic (every intermediate < 2⁶³ by
    // construction), then the 8-step Poisson(1) CDF inversion
    // (thresholds are shared 17-digit literals), the decimal Σw·v, and
    // the final divisions per replicate.
    Q("q240_bootstrap_means",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).withColumn("rid",
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")))
        graft.functions.ML.bootstrapMeans(li, "rid", "l_quantity",
          b = 16, salt = "bs")
      },
      Some("""WITH reps AS (SELECT unnest(range(0, 16)) AS rep),
             |h AS (SELECT CAST(l_quantity AS DECIMAL(18,4)) AS v,
             |    CAST('0x' || substr(md5('bs' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
             |    CAST('0x' || substr(md5('bs' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 9, 8) AS BIGINT) AS h2
             |  FROM lineitem),
             |m0 AS (SELECT reps.rep, h.v,
             |    xor(h.h1, (h.h2 + reps.rep * 2654435761) % 4294967296) AS x0
             |  FROM h CROSS JOIN reps),
             |m1 AS (SELECT rep, v, (x0 * 1597334677) % 4294967296 AS x1 FROM m0),
             |m2 AS (SELECT rep, v, (xor(x1, x1 >> 16) * 887987685) % 4294967296 AS x3 FROM m1),
             |r AS (SELECT rep, v,
             |    CAST(xor(x3, x3 >> 13) AS DOUBLE) / 4294967296.0 AS u FROM m2),
             |w AS (SELECT rep, v, CASE
             |    WHEN u < 0.36787944117144233 THEN 0
             |    WHEN u < 0.7357588823428847 THEN 1
             |    WHEN u < 0.9196986029286058 THEN 2
             |    WHEN u < 0.9810118431238462 THEN 3
             |    WHEN u < 0.9963401531726563 THEN 4
             |    WHEN u < 0.9994058151824183 THEN 5
             |    WHEN u < 0.9999167588507119 THEN 6
             |    WHEN u < 0.9999897508033253 THEN 7
             |    ELSE 8 END AS w FROM r)
             |SELECT CAST(rep AS BIGINT) AS rep, CAST(SUM(w) AS BIGINT) AS n_eff,
             |  CASE WHEN SUM(w) > 0 THEN CAST(SUM(CAST(w AS DECIMAL(19,0)) * v) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) END AS mean_rep
             |FROM w GROUP BY rep ORDER BY rep""".stripMargin))
  )
}
