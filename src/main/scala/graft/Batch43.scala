package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 43 (round 13): oracle gates for the five
  * operators that landed ungated in round 12's final commit —
  * dyadicEwma, cusumChangepoint, ridgeFit, benfordDigits,
  * joinSkewReport. Every formula term is replayed by the DuckDB SQL.
  */
private[graft] object Batch43 {

  val queries: Seq[Q] = Seq(

    // CUSUM changepoint per order priority over the daily order-count
    // series: prefix sums, the n·P − r·G scaled statistic, the
    // earliest-argmax tie-break, and the one final double division all
    // replayed. The input is the per-(key, day) AGGREGATE series — the
    // operator's documented scale shape.
    Q("q251_cusum_changepoint",
      (s, dir) => {
        val series = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"),
            col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).cast("long").as("cnt"))
        graft.operators.TimeSeries.cusumChangepoint(series,
            Seq("o_orderpriority"), "d", "cnt")
          .orderBy("o_orderpriority")
      },
      Some("""WITH s AS (SELECT o_orderpriority AS k, CAST(o_orderdate AS DATE) AS d,
             |    CAST(COUNT(*) AS BIGINT) AS v FROM orders GROUP BY 1, 2),
             |w AS (SELECT k, d, v,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY d) AS BIGINT) AS r,
             |    SUM(v) OVER (PARTITION BY k ORDER BY d ROWS UNBOUNDED PRECEDING) AS p,
             |    CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n,
             |    SUM(v) OVER (PARTITION BY k) AS g
             |  FROM s),
             |t AS (SELECT k, n, abs(n * p - r * g) AS tabs, r, d FROM w),
             |best AS (SELECT k, n, r, d, tabs,
             |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY tabs DESC, r ASC) AS rn
             |  FROM t)
             |SELECT k AS o_orderpriority, n, r AS cp_rank, d AS cp_t,
             |  CAST(tabs AS DOUBLE) / CAST(n AS DOUBLE) AS shift
             |FROM best WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin)),

    // Dyadic EWMA (α = 1/2) over the yearly order-count series per
    // priority: the shiftleft-weighted prefix sum is INTEGER arithmetic
    // end-to-end, the single division is between exactly-representable
    // integers — the scaladoc's bit-replayability claim, made true by
    // this gate (7 steps × counts ≪ 2^45 keeps the numerator < 2^53).
    Q("q252_dyadic_ewma",
      (s, dir) => {
        val series = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"),
            year(col("o_orderdate")).cast("long").as("yr"))
          .agg(count(lit(1)).cast("long").as("cnt"))
        graft.operators.TimeSeries.dyadicEwma(series,
            Seq("o_orderpriority"), "yr", "cnt")
          .orderBy("o_orderpriority", "yr")
      },
      Some("""WITH s AS (SELECT o_orderpriority AS k,
             |    CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             |    CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY 1, 2),
             |w AS (SELECT k, yr, cnt,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY yr) - 1 AS BIGINT) AS i
             |  FROM s),
             |c AS (SELECT k, yr, cnt, i,
             |    SUM(cnt * (CAST(1 AS BIGINT) << CAST(i AS INT)))
             |      OVER (PARTITION BY k ORDER BY yr ROWS UNBOUNDED PRECEDING) AS num
             |  FROM w)
             |SELECT k AS o_orderpriority, yr, cnt, i,
             |  CAST(num AS DOUBLE)
             |    / CAST((CAST(1 AS BIGINT) << CAST(i + 1 AS INT)) - 1 AS DOUBLE) AS ewma
             |FROM c ORDER BY k, yr""".stripMargin)),

    // Two-feature ridge (price ~ quantity + discount per return flag,
    // λ = 10): the nine decimal sufficient statistics, BOTH λ-shifted
    // diagonal entries, all four 3×3 Cramér determinants in the exact
    // a(ei−fh) − b(di−fg) + c(dh−eg) expansion, the relative
    // singularity tolerance, and the final divisions — every term
    // re-derived in SQL (the q173 olsFit pattern, one feature up).
    Q("q253_ridge_fit",
      (s, dir) => {
        graft.functions.ML.ridgeFit(Tables.lineitem(s, dir),
            Seq("l_returnflag"), "l_quantity", "l_discount",
            "l_extendedprice", lambda = 10.0)
          .orderBy("l_returnflag")
      },
      Some("""WITH a AS (SELECT l_returnflag,
             |    CAST(COUNT(*) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s11,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s12,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s22,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1y,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2y
             |  FROM lineitem GROUP BY 1),
             |d AS (SELECT l_returnflag, n, s1, s2, sy,
             |    s11 + 10.0 AS a11, s12, s22 + 10.0 AS a22, s1y, s2y FROM a),
             |e AS (SELECT *,
             |    n * (a11 * a22 - s12 * s12) - s1 * (s1 * a22 - s12 * s2) + s2 * (s1 * s12 - a11 * s2) AS det,
             |    sy * (a11 * a22 - s12 * s12) - s1 * (s1y * a22 - s12 * s2y) + s2 * (s1y * s12 - a11 * s2y) AS d0,
             |    n * (s1y * a22 - s12 * s2y) - sy * (s1 * a22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2) AS d1,
             |    n * (a11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - a11 * s2) AS d2,
             |    GREATEST(n, abs(s1), abs(s2)) AS r0,
             |    GREATEST(abs(s1), abs(a11), abs(s12)) AS r1,
             |    GREATEST(abs(s2), abs(s12), abs(a22)) AS r2
             |  FROM d)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             |  CASE WHEN abs(det) > 1e-9 * r0 * r1 * r2 THEN d0 / det END AS b0,
             |  CASE WHEN abs(det) > 1e-9 * r0 * r1 * r2 THEN d1 / det END AS b1,
             |  CASE WHEN abs(det) > 1e-9 * r0 * r1 * r2 THEN d2 / det END AS b2
             |FROM e ORDER BY l_returnflag""".stripMargin)),

    // Benford leading-digit audit of line prices: the decimal-cast
    // string digit extraction, the zero-filled 1–9 spine, the pinned
    // log10(1+1/d) expected shares, and each (o−e)²/e χ² term all
    // replayed per digit.
    Q("q254_benford_digits",
      (s, dir) => graft.operators.Analytics.benfordDigits(
        Tables.lineitem(s, dir), "l_extendedprice"),
      Some(s"""WITH obs AS (SELECT
              |    CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INT) AS digit,
              |    CAST(COUNT(*) AS BIGINT) AS observed
              |  FROM lineitem WHERE l_extendedprice >= 1 GROUP BY 1),
              |spine AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
              |n AS (SELECT CAST(SUM(observed) AS DOUBLE) AS nn FROM obs),
              |f AS (SELECT s.digit, COALESCE(o.observed, 0) AS observed
              |  FROM spine s LEFT JOIN obs o ON s.digit = o.digit),
              |ps AS (SELECT [${graft.operators.Analytics.benfordP.mkString(",")}] AS p),
              |t AS (SELECT f.digit, f.observed, n.nn * ps.p[f.digit] AS expected
              |  FROM f, n, ps)
              |SELECT digit, observed, expected,
              |  (CAST(observed AS DOUBLE) - expected) * (CAST(observed AS DOUBLE) - expected) / expected AS chi2_term
              |FROM t ORDER BY digit""".stripMargin)),

    // Pre-join skew probe on lineitem ⋈ orders: per-key multiplicities,
    // the decimal(38,0) would-be output rows, the mean-normalized skew
    // factor, and the (out_rows desc, key asc) topN cut — the whole
    // report re-derived, including the deterministic tie-break through
    // the ties at the cut (every lcnt·1 product repeats thousands of
    // times at sf0.01).
    Q("q255_join_skew_report",
      (s, dir) => graft.operators.Joins.joinSkewReport(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        "l_orderkey", "o_orderkey", topN = 15),
      Some("""WITH lc AS (SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS lcnt
             |  FROM lineitem GROUP BY 1),
             |rc AS (SELECT o_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS rcnt
             |  FROM orders GROUP BY 1),
             |per AS (SELECT key, lcnt, rcnt,
             |    CAST(lcnt AS DECIMAL(19,0)) * CAST(rcnt AS DECIMAL(19,0)) AS out_rows
             |  FROM lc JOIN rc USING (key)),
             |tot AS (SELECT CAST(SUM(out_rows) AS DOUBLE) AS t,
             |    CAST(COUNT(*) AS BIGINT) AS nk FROM per)
             |SELECT key, lcnt, rcnt, CAST(out_rows AS DOUBLE) AS out_rows,
             |  CAST(out_rows AS DOUBLE) / (t / CAST(nk AS DOUBLE)) AS skew
             |FROM per, tot ORDER BY per.out_rows DESC, key ASC LIMIT 15""".stripMargin)),

    // Exact Kendall τ-b over RAW CONTINUOUS x (o_totalprice, ~14.7k
    // distinct values — the regime q244's self-join gate forbids,
    // where pre-bucketing would CHANGE the statistic): the Spark side
    // is the distributed Knight plan (range-bucketed Fenwick sweeps +
    // the cross-bucket marginal grid + the inclusion-exclusion nc);
    // the oracle is the INDEPENDENT theta-join derivation — two
    // different algorithms, one statistic, hash-green.
    Q("q256_kendall_exact",
      (s, dir) => {
        val nl = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"))
        val o = Tables.orders(s, dir).join(nl, Seq("o_orderkey"))
        graft.operators.Analytics.kendallTauExact(o, "o_totalprice",
          "n_lines")
      },
      Some("""WITH j AS (SELECT o.o_orderkey, o.o_totalprice AS x,
             |    n.n_lines AS y
             |  FROM orders o JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
             |    FROM lineitem GROUP BY 1) n ON n.l_orderkey = o.o_orderkey),
             |p AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
             |cd AS (SELECT
             |    SUM(CASE WHEN b.y > a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS DECIMAL(38,0)) END) AS nc,
             |    SUM(CASE WHEN b.y < a.y THEN CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS DECIMAL(38,0)) END) AS nd
             |  FROM p a JOIN p b ON b.x > a.x),
             |tx AS (SELECT SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t1 FROM (SELECT CAST(SUM(c) AS BIGINT) AS s FROM p GROUP BY x)),
             |ty AS (SELECT SUM(CAST(s AS DECIMAL(38,0)) * (s - 1)) AS t2 FROM (SELECT CAST(SUM(c) AS BIGINT) AS s FROM p GROUP BY y)),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM p),
             |f AS (SELECT n.n, cd.nc, cd.nd,
             |    CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1) / 2.0 AS n0,
             |    CAST(tx.t1 AS DOUBLE) / 2.0 AS h1,
             |    CAST(ty.t2 AS DOUBLE) / 2.0 AS h2
             |  FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN n)
             |SELECT n, CAST(nc AS DOUBLE) AS nc, CAST(nd AS DOUBLE) AS nd,
             |  CASE WHEN n0 - h1 > 0 AND n0 - h2 > 0 THEN
             |    (CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE)) / sqrt((n0 - h1) * (n0 - h2)) END AS tau_b
             |FROM f""".stripMargin))
  )
}
