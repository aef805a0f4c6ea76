package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 30 (round 11, sixth session, wave 21):
  * Spearman rank correlation.
  */
private[graft] object Batch30 {

  val queries: Seq[Q] = Seq(

    // Spearman ρ between order totals and their line counts (positively
    // associated by construction — more lines, higher total): doubled
    // average ranks, the five decimal-exact sufficient statistics, and
    // the pinned ρ chain all replayed. floor(o_totalprice/1000) forces
    // rank ties so the average-rank machinery is under the gate.
    Q("q223_spearman",
      (s, dir) => {
        val nl = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"))
        val o = Tables.orders(s, dir).join(nl, Seq("o_orderkey"))
          .withColumn("tp", floor(col("o_totalprice") / 1000).cast("long"))
        graft.operators.Analytics.spearman(o, "tp", "n_lines")
      },
      Some("""WITH j AS (SELECT o.o_orderkey,
             |    CAST(FLOOR(o.o_totalprice / 1000) AS BIGINT) AS tp,
             |    n.n_lines
             |  FROM orders o JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
             |    FROM lineitem GROUP BY 1) n ON n.l_orderkey = o.o_orderkey),
             |r AS (SELECT
             |    2 * (RANK() OVER (ORDER BY tp ASC) - 1)
             |      + COUNT(*) OVER (PARTITION BY tp) + 1 AS rx,
             |    2 * (RANK() OVER (ORDER BY n_lines ASC) - 1)
             |      + COUNT(*) OVER (PARTITION BY n_lines) + 1 AS ry
             |  FROM j),
             |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(rx AS DECIMAL(38,0))) AS sx,
             |    SUM(CAST(ry AS DECIMAL(38,0))) AS sy,
             |    SUM(CAST(rx * ry AS DECIMAL(38,0))) AS sxy,
             |    SUM(CAST(rx * rx AS DECIMAL(38,0))) AS sxx,
             |    SUM(CAST(ry * ry AS DECIMAL(38,0))) AS syy
             |  FROM r)
             |SELECT n,
             |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho
             |FROM s""".stripMargin)),

    // 2-D histogram of (order total, line count) — both floor bins with
    // edge clamps and every cell count replayed; the (v−lo)/(hi−lo)·n
    // binning tree is the repo-wide one, pinned on both sides.
    Q("q224_histogram2d",
      (s, dir) => {
        val nl = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).cast("double").as("n_lines"))
        val o = Tables.orders(s, dir).join(nl, Seq("o_orderkey"))
        graft.operators.Analytics.histogram2d(o,
            "o_totalprice", "n_lines",
            xLo = 0.0, xHi = 400000.0, binsX = 20,
            yLo = 0.0, yHi = 8.0, binsY = 8)
          .orderBy("bx", "by")
      },
      Some("""WITH j AS (SELECT o.o_totalprice,
             |    CAST(n.n_lines AS DOUBLE) AS n_lines
             |  FROM orders o JOIN (SELECT l_orderkey, COUNT(*) AS n_lines
             |    FROM lineitem GROUP BY 1) n ON n.l_orderkey = o.o_orderkey)
             |SELECT
             |  LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / (400000.0 - 0.0) * 20) AS BIGINT), 0), 19) AS bx,
             |  LEAST(GREATEST(CAST(FLOOR((n_lines - 0.0) / (8.0 - 0.0) * 8) AS BIGINT), 0), 7) AS by,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
