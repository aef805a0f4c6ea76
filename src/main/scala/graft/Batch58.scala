package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 58 (round 16, session 2): time-series
  * diagnostics (Durbin–Watson, Ljung–Box, cross-correlation) and the
  * ordinal-association summary (Goodman–Kruskal γ + Somers' D) on the
  * q244 concordance machinery.
  */
private[graft] object Batch58 {

  private val dailyMean =
    """SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS t,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
      |  FROM events GROUP BY 1""".stripMargin

  val queries: Seq[Q] = Seq(

    // Durbin-Watson of the daily mean-value series: squared-difference
    // numerator over the t+1 equi-join, raw sum-of-squares denominator,
    // both pinned decimal sums.
    Q("q371_durbin_watson",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("t"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        graft.operators.TimeSeries.durbinWatson(daily, "t", "v")
      },
      Some(s"""WITH daily AS ($dailyMean),
             |den AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS den
             |  FROM daily),
             |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |    CAST(SUM(CAST((b.v - a.v) * (b.v - a.v) AS DECIMAL(28,12))) AS DOUBLE) AS num
             |  FROM daily a JOIN daily b ON b.t = a.t + 1)
             |SELECT n, n_pairs,
             |  CASE WHEN den > 0 THEN num / den END AS dw
             |FROM den, p""".stripMargin)),

    // Ljung-Box Q over lags 1..7 of the daily mean-value series: the
    // acf chain per lag (decimal mean, pinned centered products,
    // equi-join pairing) then the h-term pinned sum.
    Q("q372_ljung_box",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("t"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        graft.operators.TimeSeries.ljungBox(daily, "t", "v", maxLag = 7)
      },
      Some(s"""WITH daily AS ($dailyMean),
             |m AS (SELECT CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean,
             |    CAST(COUNT(*) AS BIGINT) AS n FROM daily),
             |den AS (SELECT CAST(SUM(CAST((v - m.mean) * (v - m.mean) AS DECIMAL(28,12))) AS DOUBLE) AS den
             |  FROM daily, m),
             |lags AS (SELECT unnest(range(1, 8)) AS lag),
             |num AS (SELECT lag,
             |    CAST(SUM(CAST((a.v - m.mean) * (b.v - m.mean) AS DECIMAL(28,12))) AS DOUBLE) AS num
             |  FROM daily a CROSS JOIN lags JOIN daily b ON b.t = a.t + lag, m
             |  GROUP BY lag),
             |r AS (SELECT lag,
             |    CASE WHEN den.den > 0 THEN num / den.den END AS acf
             |  FROM num, den),
             |s AS (SELECT m.n, CAST(COUNT(*) AS BIGINT) AS h,
             |    CAST(SUM(CAST(acf * acf / (CAST(m.n AS DOUBLE) - CAST(lag AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS s
             |  FROM r, m GROUP BY m.n)
             |SELECT n, h,
             |  CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * s AS q_stat
             |FROM s""".stripMargin)),

    // Cross-correlation daily views vs clicks at lags -3..3: lead/lag
    // detection - the peak's sign reads as which series leads.
    Q("q373_ccf",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("t"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("double").as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .cast("double").as("y"))
        graft.operators.TimeSeries.ccf(daily, "t", "x", "y", maxLag = 3)
      },
      Some("""WITH daily AS (SELECT (CAST(epoch_us(ts) AS BIGINT) * 1000) // 86400000000000 AS t,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE) AS x,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |m AS (SELECT CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mx,
             |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS my
             |  FROM daily),
             |den AS (SELECT
             |    CAST(SUM(CAST((x - m.mx) * (x - m.mx) AS DECIMAL(28,12))) AS DOUBLE) AS dx,
             |    CAST(SUM(CAST((y - m.my) * (y - m.my) AS DECIMAL(28,12))) AS DOUBLE) AS dy
             |  FROM daily, m),
             |lags AS (SELECT unnest(range(-3, 4)) AS lag),
             |num AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |    CAST(SUM(CAST((a.x - m.mx) * (b.y - m.my) AS DECIMAL(28,12))) AS DOUBLE) AS num
             |  FROM daily a CROSS JOIN lags JOIN daily b ON b.t = a.t + lag, m
             |  GROUP BY lag)
             |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             |  CASE WHEN den.dx > 0 AND den.dy > 0
             |    THEN num / (SQRT(den.dx) * SQRT(den.dy)) END AS ccf
             |FROM num, den ORDER BY lag""".stripMargin)),

    // Ordinal association on q244's fixture (price band x line count):
    // gamma, both Somers' D directions, and tau_b from one concordance
    // pass - tau_b must equal q244's value on the same data.
    Q("q374_ordinal_assoc",
      (s, dir) => {
        val nl = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"))
        val o = Tables.orders(s, dir).join(nl, Seq("o_orderkey"))
          .withColumn("tp", floor(col("o_totalprice") / 1000).cast("long"))
        graft.operators.Analytics.ordinalAssociation(o, "tp", "n_lines")
      },
      Some("""WITH j AS (SELECT o.o_orderkey,
             |    CAST(FLOOR(o.o_totalprice / 1000) AS BIGINT) AS x,
             |    n.n_lines AS y
             |  FROM orders o JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
             |    FROM lineitem GROUP BY 1) n ON n.l_orderkey = o.o_orderkey),
             |p AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
             |cd AS (SELECT
             |    COALESCE(SUM(CASE WHEN b.y > a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS DECIMAL(38,0)) END), 0) AS nc,
             |    COALESCE(SUM(CASE WHEN b.y < a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS DECIMAL(38,0)) END), 0) AS nd
             |  FROM p a JOIN p b ON b.x > a.x),
             |tx AS (SELECT SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t1 FROM (SELECT CAST(SUM(c) AS BIGINT) AS s FROM p GROUP BY x)),
             |ty AS (SELECT SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t2 FROM (SELECT CAST(SUM(c) AS BIGINT) AS s FROM p GROUP BY y)),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM p),
             |f AS (SELECT n.n, cd.nc, cd.nd,
             |    CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1) / 2.0 AS n0,
             |    CAST(tx.t1 AS DOUBLE) / 2.0 AS h1,
             |    CAST(ty.t2 AS DOUBLE) / 2.0 AS h2,
             |    CAST(cd.nc AS DOUBLE) - CAST(cd.nd AS DOUBLE) AS s
             |  FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN n)
             |SELECT n, CAST(nc AS DOUBLE) AS nc, CAST(nd AS DOUBLE) AS nd,
             |  CASE WHEN CAST(nc AS DOUBLE) + CAST(nd AS DOUBLE) > 0
             |    THEN s / (CAST(nc AS DOUBLE) + CAST(nd AS DOUBLE)) END AS gamma,
             |  CASE WHEN n0 - h1 > 0 THEN s / (n0 - h1) END AS somers_d_yx,
             |  CASE WHEN n0 - h2 > 0 THEN s / (n0 - h2) END AS somers_d_xy,
             |  CASE WHEN n0 - h1 > 0 AND n0 - h2 > 0
             |    THEN s / sqrt((n0 - h1) * (n0 - h2)) END AS tau_b
             |FROM f""".stripMargin))
  )
}
