package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 91 (round 19, continuation wave P): the
  * sequential Poisson-rate monitor (completing the mSPRT
  * mean/proportion/rate triple) and the bootstrap ratio-metric CI.
  */
private[graft] object Batch91 {

  val queries: Seq[Q] = Seq(

    // Rate mSPRT over a deterministic (count, exposure) stream in
    // event order: exact decimal(38,0)/decimal(38,12) cumulatives on
    // the distributed prefix, V = lambda0/E, and the mixture chain all
    // replayed by DuckDB's cumulative window.
    Q("q480_msprt_rate",
      (s, dir) => graft.operators.Analytics.msprtRateTest(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("t"),
            pmod(col("event_id") * 2654435761L, lit(5L)).as("x"),
            (lit(0.5) + pmod(col("event_id"), lit(10L)).cast("double") /
              lit(10.0)).as("e")),
        "t", "x", "e", lambda0 = 2.0, tau2 = 0.5, alpha = 0.05),
      Some("""WITH b AS (SELECT event_id AS t,
             |    CAST((event_id * 2654435761) % 5 AS DECIMAL(38,0)) AS x,
             |    0.5 + CAST(event_id % 10 AS DOUBLE) / 10.0 AS e
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT t,
             |    SUM(x) OVER w AS xt,
             |    SUM(CAST(e AS DECIMAL(38,12))) OVER w AS et
             |  FROM b WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT t, CAST(xt AS DOUBLE) AS x_total,
             |    CAST(et AS DOUBLE) AS e_total,
             |    CAST(xt AS DOUBLE) / CAST(et AS DOUBLE) AS rate,
             |    2.0 / CAST(et AS DOUBLE) AS vt FROM c),
             |e2 AS (SELECT t, x_total, e_total, rate,
             |    0.5 * LN(vt / (vt + 0.5)) +
             |      ((rate - 2.0) * (rate - 2.0) * 0.5) /
             |        (2.0 * vt * (vt + 0.5)) AS e_log FROM m)
             |SELECT t, x_total, e_total, rate, e_log,
             |  e_log >= LN(1.0 / 0.05) AS crossed
             |FROM e2 ORDER BY t""".stripMargin)),

    // Bootstrap percentile CI for the revenue-per-unit ratio on
    // lineitem (the q240 Poisson-weight machinery, both weighted sums
    // per replicate from ONE scan, the B-bounded sorted pick): the
    // delta-method cross-check every ratio metric should ship with.
    Q("q481_bootstrap_ratio",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).withColumn("rid",
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")))
        graft.functions.ML.bootstrapRatioCI(li, "rid",
          "l_extendedprice", "l_quantity", b = 16, salt = "br")
      },
      Some("""WITH reps AS (SELECT unnest(range(0, 16)) AS rep),
             |h AS (SELECT CAST(l_extendedprice AS DECIMAL(18,4)) AS x,
             |    CAST(l_quantity AS DECIMAL(18,4)) AS y,
             |    CAST('0x' || substr(md5('br' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
             |    CAST('0x' || substr(md5('br' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 9, 8) AS BIGINT) AS h2
             |  FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
             |m0 AS (SELECT reps.rep, h.x, h.y,
             |    xor(h.h1, (h.h2 + reps.rep * 2654435761) % 4294967296) AS x0
             |  FROM h CROSS JOIN reps),
             |m1 AS (SELECT rep, x, y, (x0 * 1597334677) % 4294967296 AS x1 FROM m0),
             |m2 AS (SELECT rep, x, y, (xor(x1, x1 >> 16) * 887987685) % 4294967296 AS x3 FROM m1),
             |r0 AS (SELECT rep, x, y,
             |    CAST(xor(x3, x3 >> 13) AS DOUBLE) / 4294967296.0 AS u FROM m2),
             |w AS (SELECT rep, x, y, CASE
             |    WHEN u < 0.36787944117144233 THEN 0
             |    WHEN u < 0.7357588823428847 THEN 1
             |    WHEN u < 0.9196986029286058 THEN 2
             |    WHEN u < 0.9810118431238462 THEN 3
             |    WHEN u < 0.9963401531726563 THEN 4
             |    WHEN u < 0.9994058151824183 THEN 5
             |    WHEN u < 0.9999167588507119 THEN 6
             |    WHEN u < 0.9999897508033253 THEN 7
             |    ELSE 8 END AS w FROM r0),
             |s AS (SELECT rep,
             |    SUM(CAST(w AS DECIMAL(19,0)) * x) AS sx,
             |    SUM(CAST(w AS DECIMAL(19,0)) * y) AS sy
             |  FROM w GROUP BY rep),
             |r AS (SELECT rep, CASE WHEN sy <> 0
             |    THEN CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) END AS r
             |  FROM s),
             |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS DOUBLE) AS fx,
             |    CAST(SUM(y) AS DOUBLE) AS fy FROM h),
             |agg AS (SELECT CAST(COUNT(r) AS BIGINT) AS b_eff,
             |    LIST(r ORDER BY r) AS rs FROM r WHERE r IS NOT NULL)
             |SELECT CAST(16 AS BIGINT) AS b, agg.b_eff, f.n,
             |  CASE WHEN f.fy <> 0 THEN f.fx / f.fy END AS est,
             |  CASE WHEN agg.b_eff > 0 THEN agg.rs[CAST(GREATEST(CEIL(0.025 * CAST(agg.b_eff AS DOUBLE)), 1.0) AS BIGINT)] END AS lo,
             |  CASE WHEN agg.b_eff > 0 THEN agg.rs[CAST(GREATEST(CEIL(0.975 * CAST(agg.b_eff AS DOUBLE)), 1.0) AS BIGINT)] END AS hi
             |FROM agg CROSS JOIN f""".stripMargin))
  )
}
