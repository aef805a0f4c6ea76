package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 17 (round 11, fifth session, first wave): the
  * prefix-filtered set-similarity join (the LOSSLESS candidate-pruning
  * lever next to the lossy maxDF cap) and the exact-sufficient-statistic
  * analytics pair — per-group OLS/Pearson fit and z-score outlier
  * detection.
  */
private[graft] object Batch17 {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)

  val queries: Seq[Q] = Seq(

    // Prefix-filtered exact-Jaccard pairs under q33's oracle VERBATIM
    // (same n=3, threshold=0.3): candidate generation indexes only each
    // doc's (|d| − ⌈t·|d|⌉ + 1)-prefix in the ascending-df canonical
    // order (SSJoin/PPJoin prefix filtering — lossless by theorem, see
    // Dedup.jaccardPairsPrefix), then every candidate is verified
    // against the FULL index. Green certifies the canonical order, the
    // prefix-length arithmetic, the size filter, and the exact verify
    // all preserve q33's output bit-for-bit — the whole point of a
    // lossless pruning knob.
    Q("q172_dedup_jaccard_prefix",
      (s, dir) => {
        graft.functions.Dedup.jaccardPairsPrefix(
            docs(s, dir), "doc_id", "text", n = 3, threshold = 0.3)
          .orderBy("i", "j")
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
             |  FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
             |  FROM toks),
             |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT i, j, n_common,
             |  CAST(n_common AS DOUBLE) / (si.sz + sj.sz - n_common) AS jaccard
             |FROM inter
             |JOIN sizes si ON si.doc_id = i
             |JOIN sizes sj ON sj.doc_id = j
             |WHERE CAST(n_common AS DOUBLE) / (si.sz + sj.sz - n_common) >= 0.3
             |ORDER BY i, j""".stripMargin)),

    // Per-group OLS + Pearson r (price ~ quantity per return flag): the
    // five sufficient statistics accumulate in exact decimal, then
    // slope/intercept/r are pinned double expressions the oracle
    // replays term-for-term (sqrt is IEEE-correctly-rounded in both
    // engines — the q164 norm precedent). One map-side-combined
    // aggregate; the fact table never shuffles.
    Q("q173_ols_fit",
      (s, dir) => {
        graft.functions.ML.olsFit(Tables.lineitem(s, dir),
            Seq("l_returnflag"), "l_quantity", "l_extendedprice")
          .orderBy("l_returnflag")
      },
      Some("""WITH a AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
             |  (n * sxy - sx * sy)
             |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS r
             |FROM a ORDER BY l_returnflag""".stripMargin)),

    // Per-group z-score outliers (order price per priority, k=1.6 —
    // the near-uniform price distribution caps |z| at ~1.73, so k=2
    // would gate an empty set): the
    // moment aggregate is exact decimal, the mean/std/flag arithmetic
    // is pinned double — the oracle re-derives every emitted row AND
    // re-applies the threshold, so the detection decision itself is
    // under the gate, not just the annotations.
    Q("q174_outliers_z",
      (s, dir) => {
        graft.operators.Analytics.outliersZ(Tables.orders(s, dir),
            Seq("o_orderpriority"), "o_totalprice", k = 1.6)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"), col("mean"), col("std"), col("z"))
          .orderBy("o_orderkey")
      },
      Some("""WITH st AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ss
             |  FROM orders GROUP BY 1)
             |SELECT o_orderkey, o_orderpriority, o_totalprice,
             |  s / n AS mean, sqrt((ss - s * s / n) / n) AS std,
             |  (o_totalprice - s / n) / sqrt((ss - s * s / n) / n) AS z
             |FROM orders JOIN st USING (o_orderpriority)
             |WHERE abs(o_totalprice - s / n) > 1.6 * sqrt((ss - s * s / n) / n)
             |ORDER BY o_orderkey""".stripMargin))
  )
}
