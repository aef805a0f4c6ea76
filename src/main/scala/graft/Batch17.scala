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
             |ORDER BY o_orderkey""".stripMargin)),

    // Interval×interval overlap join (purchase attention window ×
    // click attention window per user): both sides explode to 3 h
    // buckets, pairs meet on (user, bucket), and the canonical-bucket
    // rule keeps each pair exactly once with NO distinct pass. The
    // oracle is the plain inequality join — green certifies bucketing,
    // the canonical rule, and the exact overlap filter reproduce it.
    // ts is int64 nanos (Tables.events); epoch_us·1000 matches exactly.
    Q("q175_interval_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            col("ts").as("p_lo"),
            (col("ts") + lit(21600000000000L)).as("p_hi")) // +6h
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"),
            col("ts").as("c_lo"),
            (col("ts") + lit(10800000000000L)).as("c_hi")) // +3h
        graft.operators.Joins.intervalJoin(p, c, Seq("user_id"),
            "p_lo", "p_hi", "c_lo", "c_hi",
            bucketWidth = 10800000000000L) // 3h ≈ the shorter span
          .select(col("p_id"), col("c_id"), col("user_id"),
            (least(col("p_hi"), col("c_hi")) -
              greatest(col("p_lo"), col("c_lo"))).as("overlap_ns"))
          .orderBy("p_id", "c_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id AS p_id,
             |    epoch_us(ts)*1000 AS p_lo,
             |    epoch_us(ts)*1000 + 21600000000000 AS p_hi
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, event_id AS c_id,
             |    epoch_us(ts)*1000 AS c_lo,
             |    epoch_us(ts)*1000 + 10800000000000 AS c_hi
             |  FROM events WHERE event_type = 'click')
             |SELECT p_id, c_id, user_id,
             |  least(p_hi, c_hi) - greatest(p_lo, c_lo) AS overlap_ns
             |FROM p JOIN c USING (user_id)
             |WHERE p_lo <= c_hi AND c_lo <= p_hi
             |ORDER BY p_id, c_id""".stripMargin)),

    // Per-node triangle counts on the co-purchase graph (parts sharing
    // an order): degree-ordered orientation bounds the wedge fanout by
    // O(√m) per node — see Graphs.triangleCount. The oracle counts the
    // same triangles by the naive 3-way join (fine at oracle scale,
    // exactly the plan the orientation exists to avoid at 100 TB) and
    // fans each onto its three corners; green certifies normalization,
    // orientation, wedge generation, closing-edge semantics, and the
    // per-node fan-out all agree with the definitional count.
    Q("q176_triangles",
      (s, dir) => {
        val e = Tables.coPurchaseEdges(s, dir)
        graft.functions.Graphs.triangleCount(e).orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |tri AS (SELECT ab.i AS a, ab.j AS b, ac.j AS c FROM e ab
             |  JOIN e ac ON ab.i = ac.i AND ab.j < ac.j
             |  JOIN e bc ON bc.i = ab.j AND bc.j = ac.j)
             |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
             |FROM (SELECT a AS node FROM tri
             |      UNION ALL SELECT b FROM tri
             |      UNION ALL SELECT c FROM tri)
             |GROUP BY node ORDER BY node""".stripMargin)),

    // Linear-interpolation resample (daily grid per user): gap buckets
    // interpolate between the surrounding observed aggregates — the
    // upsampling complement of q154's LOCF fill. The oracle replays the
    // bucket aggregate (exact decimal), both lead windows, the gap
    // generation, and the pinned interpolation formula, so every
    // generated value is gated, not just the observed ones.
    Q("q177_resample_interp",
      (s, dir) => {
        graft.operators.TimeSeries.resampleInterp(
            Tables.events(s, dir), Seq("user_id"), "ts",
            width = 86400000000000L, // 1 day in ns
            aggs = Seq("n" -> count(lit(1)),
              "sum_value" -> sum(col("value").cast("decimal(18,4)"))))
          .orderBy("user_id", "bucket")
      },
      Some("""WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
             |    CAST(COUNT(*) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |  FROM events GROUP BY 1, 2),
             |nx AS (SELECT user_id, bucket, n, sum_value,
             |    LEAD(bucket) OVER (PARTITION BY user_id ORDER BY bucket) AS nxt,
             |    LEAD(n) OVER (PARTITION BY user_id ORDER BY bucket) AS nxn,
             |    LEAD(sum_value) OVER (PARTITION BY user_id ORDER BY bucket) AS nxs
             |  FROM b),
             |g AS (SELECT user_id, unnest(range(bucket, COALESCE(nxt, bucket + 1))) AS gb,
             |    bucket, nxt, n, nxn, sum_value, nxs FROM nx)
             |SELECT user_id, gb AS bucket, (gb = bucket) AS present,
             |  CASE WHEN gb = bucket THEN n ELSE
             |    n + (nxn - n) * (CAST(gb - bucket AS DOUBLE) / CAST(nxt - bucket AS DOUBLE)) END AS n,
             |  CASE WHEN gb = bucket THEN sum_value ELSE
             |    sum_value + (nxs - sum_value) * (CAST(gb - bucket AS DOUBLE) / CAST(nxt - bucket AS DOUBLE)) END AS sum_value
             |FROM g ORDER BY user_id, bucket""".stripMargin)),

    // SCD type-2 dimension maintenance: two merge batches over the
    // customer dimension — initial load at ts=1000, then an upsert feed
    // at ts=2000 carrying changed segments (7|key), changed balances
    // (11|key), a deliberately-unchanged slice (13|key — must NOT
    // version), and brand-new keys (97|key, re-keyed +1e6). The oracle
    // re-derives the full version table: closed+reopened rows for
    // changed keys, single open rows for untouched AND
    // unchanged-in-feed keys, first versions for inserts — so the
    // change detection, idempotence, and interval bookkeeping are all
    // under the gate.
    Q("q178_scd_merge",
      (s, dir) => {
        import graft.sources.IO
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val keys = Seq("c_custkey")
        val tracked = Seq("c_mktsegment", "c_acctbal")
        val v0 = cust.withColumn("valid_from", lit(0L))
          .withColumn("valid_to", lit(null).cast("long")).limit(0)
        val t1 = IO.scdMerge(v0, cust, keys, tracked, batchTs = 1000L)
        val changedFeed = cust
          .filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 11 === 0 ||
            col("c_custkey") % 13 === 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 7 === 0, lit("MOVED"))
              .otherwise(col("c_mktsegment")).as("c_mktsegment"),
            when(col("c_custkey") % 11 === 0, col("c_acctbal") + 100.0)
              .otherwise(col("c_acctbal")).as("c_acctbal"))
        val freshFeed = cust.filter(col("c_custkey") % 97 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            lit("FRESH").as("c_mktsegment"), lit(0.0).as("c_acctbal"))
        IO.scdMerge(t1, changedFeed.union(freshFeed), keys, tracked,
            batchTs = 2000L)
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
             |d2 AS (SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS m,
             |    CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS a
             |  FROM base
             |  WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0 OR c_custkey % 13 = 0),
             |chg AS (SELECT b.c_custkey, b.c_mktsegment AS m0, b.c_acctbal AS a0,
             |    d2.m, d2.a
             |  FROM base b JOIN d2 ON b.c_custkey = d2.c_custkey
             |  WHERE d2.m IS DISTINCT FROM b.c_mktsegment
             |     OR d2.a IS DISTINCT FROM b.c_acctbal)
             |SELECT * FROM (
             |  SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal,
             |      CAST(1000 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
             |    FROM base b WHERE b.c_custkey NOT IN (SELECT c_custkey FROM chg)
             |  UNION ALL
             |  SELECT c_custkey, m0, a0, 1000, 2000 FROM chg
             |  UNION ALL
             |  SELECT c_custkey, m, a, 2000, NULL FROM chg
             |  UNION ALL
             |  SELECT c_custkey + 1000000, 'FRESH', 0.0, 2000, NULL
             |    FROM base WHERE c_custkey % 97 = 0)
             |ORDER BY c_custkey, valid_from""".stripMargin))
  )
}
