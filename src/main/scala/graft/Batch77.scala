package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 77 (round 18, wave 3): the experimentation
  * family — CUPED variance reduction, sample-ratio-mismatch, the
  * delta-method ratio-metric test, and e-BH (the e-value FDR
  * companion to this round's mSPRT monitors).
  */
private[graft] object Batch77 {

  val queries: Seq[Q] = Seq(

    // CUPED on a hash-split purchase A/B with a planted +30 treatment
    // bump on every 7th B event, using the raw value as the
    // pre-period covariate: all 12 exact-decimal moment sums, the
    // pooled theta/rho2, both arms' closed-form adjusted moments, and
    // the Welch chain on the adjusted metric are replayed by DuckDB.
    Q("q433_cuped",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("event_id"), "cup") <
              2147483648L, "a").otherwise("b"))
          .withColumn("y",
            when(col("grp") === "b" && col("event_id") % 7 === 0,
              col("value") + 30.0).otherwise(col("value")))
        graft.operators.Analytics.cupedTest(ev, "grp", "y", "value",
          "a", "b")
      },
      Some("""WITH g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('cup' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'a' ELSE 'b' END AS grp,
             |    event_id, value FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |p AS (SELECT grp,
             |    CAST(CASE WHEN grp = 'b' AND event_id % 7 = 0
             |      THEN value + 30.0 ELSE value END AS DECIMAL(18,2)) AS y,
             |    CAST(value AS DECIMAL(18,2)) AS x FROM g),
             |s AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN y END) AS DOUBLE) AS sya,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN x END) AS DOUBLE) AS sxa,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN y * y END) AS DOUBLE) AS syya,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN x * x END) AS DOUBLE) AS sxxa,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN x * y END) AS DOUBLE) AS sxya,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN y END) AS DOUBLE) AS syb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN x END) AS DOUBLE) AS sxb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN y * y END) AS DOUBLE) AS syyb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN x * x END) AS DOUBLE) AS sxxb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN x * y END) AS DOUBLE) AS sxyb
             |  FROM p),
             |c AS (SELECT *,
             |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd,
             |    sxa + sxb AS sx, sya + syb AS sy, sxxa + sxxb AS sxx,
             |    syya + syyb AS syy, sxya + sxyb AS sxy FROM s),
             |t AS (SELECT *,
             |    (sxx - sx * sx / nd) / (nd - 1.0) AS varx,
             |    (syy - sy * sy / nd) / (nd - 1.0) AS vary,
             |    (sxy - sx * sy / nd) / (nd - 1.0) AS covxy,
             |    sx / nd AS xbar FROM c),
             |u AS (SELECT *,
             |    CASE WHEN varx > 0 THEN covxy / varx END AS theta,
             |    CASE WHEN varx > 0 AND vary > 0
             |      THEN covxy * covxy / (varx * vary) END AS rho2 FROM t),
             |v AS (SELECT n_a, n_b, theta, rho2,
             |    sya / CAST(n_a AS DOUBLE)
             |      - theta * (sxa / CAST(n_a AS DOUBLE) - xbar) AS mean_a_adj,
             |    syb / CAST(n_b AS DOUBLE)
             |      - theta * (sxb / CAST(n_b AS DOUBLE) - xbar) AS mean_b_adj,
             |    (syya - sya * sya / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
             |      - 2.0 * theta * ((sxya - sxa * sya / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
             |      + theta * theta * ((sxxa - sxa * sxa / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
             |      AS var_a_adj,
             |    (syyb - syb * syb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
             |      - 2.0 * theta * ((sxyb - sxb * syb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
             |      + theta * theta * ((sxxb - sxb * sxb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
             |      AS var_b_adj
             |  FROM u),
             |w AS (SELECT *, mean_a_adj - mean_b_adj AS diff,
             |    var_a_adj / CAST(n_a AS DOUBLE) AS sea2,
             |    var_b_adj / CAST(n_b AS DOUBLE) AS seb2 FROM v)
             |SELECT n_a, n_b, theta, rho2, mean_a_adj, mean_b_adj,
             |  var_a_adj, var_b_adj, diff,
             |  CASE WHEN sea2 + seb2 > 0 THEN sqrt(sea2 + seb2) END AS se,
             |  CASE WHEN sea2 + seb2 > 0
             |    THEN diff / sqrt(sea2 + seb2) END AS t,
             |  CASE WHEN sea2 + seb2 > 0 THEN
             |    (sea2 + seb2) * (sea2 + seb2) /
             |      (sea2 * sea2 / (CAST(n_a AS DOUBLE) - 1.0)
             |        + seb2 * seb2 / (CAST(n_b AS DOUBLE) - 1.0)) END AS dof
             |FROM w""".stripMargin)),

    // SRM on a designed 40/40/20 hash split: the chi-square of the
    // observed arm counts against the design (exact integer
    // thresholds, fixed-order term fold). A healthy split lands chi2
    // near its dof = 2 - the statistic, not a flag, is the output.
    Q("q434_srm",
      (s, dir) => {
        val u = graft.functions.Sampling.hashU32(col("event_id"), "srm")
        val ev = Tables.events(s, dir)
          .withColumn("grp", when(u < 1717986918L, "a")
            .when(u < 3435973836L, "b").otherwise("c"))
        graft.operators.Analytics.srmTest(ev, "grp",
          Seq("a" -> 2.0, "b" -> 2.0, "c" -> 1.0))
      },
      Some("""WITH g AS (SELECT CASE
             |    WHEN CAST('0x' || substr(md5('srm' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 1717986918 THEN 'a'
             |    WHEN CAST('0x' || substr(md5('srm' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 3435973836 THEN 'b'
             |    ELSE 'c' END AS grp FROM events),
             |s AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS oa,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS ob,
             |    CAST(SUM(CASE WHEN grp = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS oc
             |  FROM g),
             |t AS (SELECT oa + ob + oc AS n, oa, ob, oc FROM s)
             |SELECT n, CAST(0 AS BIGINT) AS n_other, CAST(3 AS BIGINT) AS k,
             |  CASE WHEN n > 0 THEN
             |    (CAST(oa AS DOUBLE) - CAST(n AS DOUBLE) * 0.4)
             |      * (CAST(oa AS DOUBLE) - CAST(n AS DOUBLE) * 0.4)
             |      / (CAST(n AS DOUBLE) * 0.4)
             |    + (CAST(ob AS DOUBLE) - CAST(n AS DOUBLE) * 0.4)
             |      * (CAST(ob AS DOUBLE) - CAST(n AS DOUBLE) * 0.4)
             |      / (CAST(n AS DOUBLE) * 0.4)
             |    + (CAST(oc AS DOUBLE) - CAST(n AS DOUBLE) * 0.2)
             |      * (CAST(oc AS DOUBLE) - CAST(n AS DOUBLE) * 0.2)
             |      / (CAST(n AS DOUBLE) * 0.2) END AS chi2,
             |  CAST(2 AS BIGINT) AS dof
             |FROM t""".stripMargin)),

    // Delta-method ratio metric: per-user purchase share (purchases /
    // events, each USER one unit) between hash-split arms - the
    // variance the naive per-row test misses comes from the random
    // per-user denominators; every per-arm moment sum and the fixed
    // delta-method chain is replayed by DuckDB.
    Q("q435_ratio_metric",
      (s, dir) => {
        val units = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("num"),
            count(lit(1)).as("den"))
          .withColumn("grp",
            when(graft.functions.Sampling.hashU32(col("user_id"), "rm") <
              2147483648L, "a").otherwise("b"))
        graft.operators.Analytics.ratioMetricTest(units, "grp",
          "num", "den", "a", "b")
      },
      Some("""WITH units AS (SELECT user_id,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DECIMAL(18,2)) AS num,
             |    CAST(COUNT(*) AS DECIMAL(18,2)) AS den
             |  FROM events GROUP BY user_id),
             |g AS (SELECT CASE WHEN
             |    CAST('0x' || substr(md5('rm' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      < 2147483648 THEN 'a' ELSE 'b' END AS grp, num, den
             |  FROM units),
             |s AS (SELECT
             |    CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN num END) AS DOUBLE) AS sna,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN den END) AS DOUBLE) AS sda,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN num * num END) AS DOUBLE) AS snna,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN den * den END) AS DOUBLE) AS sdda,
             |    CAST(SUM(CASE WHEN grp = 'a' THEN num * den END) AS DOUBLE) AS snda,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN num END) AS DOUBLE) AS snb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN den END) AS DOUBLE) AS sdb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN num * num END) AS DOUBLE) AS snnb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN den * den END) AS DOUBLE) AS sddb,
             |    CAST(SUM(CASE WHEN grp = 'b' THEN num * den END) AS DOUBLE) AS sndb
             |  FROM g),
             |a AS (SELECT *,
             |    CASE WHEN sda <> 0.0 THEN sna / sda END AS ratio_a,
             |    CASE WHEN n_a > 0 THEN sda / CAST(n_a AS DOUBLE) END AS dbara,
             |    CASE WHEN n_a >= 2 THEN (snna - sna * sna / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) END AS varna,
             |    CASE WHEN n_a >= 2 THEN (sdda - sda * sda / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) END AS varda,
             |    CASE WHEN n_a >= 2 THEN (snda - sna * sda / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) END AS covnda,
             |    CASE WHEN sdb <> 0.0 THEN snb / sdb END AS ratio_b,
             |    CASE WHEN n_b > 0 THEN sdb / CAST(n_b AS DOUBLE) END AS dbarb,
             |    CASE WHEN n_b >= 2 THEN (snnb - snb * snb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) END AS varnb,
             |    CASE WHEN n_b >= 2 THEN (sddb - sdb * sdb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) END AS vardb,
             |    CASE WHEN n_b >= 2 THEN (sndb - snb * sdb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) END AS covndb
             |  FROM s),
             |e AS (SELECT *,
             |    CASE WHEN dbara <> 0.0 THEN
             |      (varna - 2.0 * ratio_a * covnda + ratio_a * ratio_a * varda)
             |        / (CAST(n_a AS DOUBLE) * dbara * dbara) END AS se2a,
             |    CASE WHEN dbarb <> 0.0 THEN
             |      (varnb - 2.0 * ratio_b * covndb + ratio_b * ratio_b * vardb)
             |        / (CAST(n_b AS DOUBLE) * dbarb * dbarb) END AS se2b
             |  FROM a)
             |SELECT n_a, n_b, ratio_a, ratio_b, ratio_a - ratio_b AS diff,
             |  CASE WHEN se2a + se2b > 0 THEN sqrt(se2a + se2b) END AS se,
             |  CASE WHEN se2a + se2b > 0
             |    THEN (ratio_a - ratio_b) / sqrt(se2a + se2b) END AS z
             |FROM e""".stripMargin)),

    // e-BH over a per-user e-value table (deterministic salted
    // e-values with ties, zeros - the never-reject class - and ~1%
    // NULLs): the distinct-e rank, the (m - cum) x e product, the
    // ascending-inclusive suffix max, and the m / max cap are all
    // replayed by DuckDB windows. The companion to q428-q430: read
    // each monitor's exp(e_log) whenever you like, feed the column
    // here, FDR holds under arbitrary dependence.
    Q("q436_ebh_adjust",
      (s, dir) => {
        val hyp = Tables.events(s, dir)
          .select(col("user_id")).distinct()
          .withColumn("e",
            when(col("user_id") % 97 =!= 0,
              ((col("user_id") * 2654435761L) % 1009L).cast("double")
                / 100.0))
        graft.operators.Analytics.eBHAdjust(hyp, "e")
          .orderBy("user_id")
      },
      Some("""WITH hyp AS (SELECT DISTINCT user_id FROM events),
             |h AS (SELECT user_id, CASE WHEN user_id % 97 <> 0
             |    THEN CAST((user_id * 2654435761) % 1009 AS DOUBLE) / 100.0
             |    END AS e FROM hyp),
             |de AS (SELECT e, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM h WHERE e IS NOT NULL GROUP BY e),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM de),
             |r AS (SELECT e,
             |    COALESCE(SUM(c) OVER (ORDER BY e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cum, c FROM de),
             |q AS (SELECT e,
             |    (CAST(m AS DOUBLE) - CAST(cum AS DOUBLE)) * e AS q, m
             |  FROM r CROSS JOIN n),
             |mx AS (SELECT e, m,
             |    MAX(q) OVER (ORDER BY e ROWS UNBOUNDED PRECEDING) AS mq
             |  FROM q),
             |adj AS (SELECT e, CASE WHEN mq > 0
             |    THEN LEAST(1.0, CAST(m AS DOUBLE) / mq) END AS alpha_star
             |  FROM mx)
             |SELECT h.user_id, h.e, adj.alpha_star
             |FROM h LEFT JOIN adj ON h.e = adj.e
             |ORDER BY h.user_id""".stripMargin))
  )
}
