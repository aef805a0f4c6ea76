package graft

import graft.SparkEntry.Q
import graft.operators.Analytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Query registry batch 15 (round 11, fourth session, third wave):
  * event analytics — ordered funnel conversion, cohort retention — and
  * the corpus snapshot diff.
  */
private[graft] object Batch15 {

  val queries: Seq[Q] = Seq(

    // Ordered funnel view → click → purchase within 7 days: t₁ = first
    // view, each later step the first strictly-later event of its type,
    // conversion iff the chain completes within the window. The oracle
    // re-derives the greedy earliest-completion chain step by step —
    // the strict ordering, the null-chaining, the depth count, and the
    // conversion window are all under the gate. (ts arithmetic at µs in
    // the oracle ≡ ns in Spark: the normalization is ×1000 exactly.)
    Q("q165_funnel",
      (s, dir) => {
        Analytics.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
            steps = Seq("view", "click", "purchase"),
            within = 7L * 86400L * 1000000000L)
          .select(col("user_id"), col("n_steps"),
            expr("t_first div 1000").as("t_first_us"),
            expr("t_last div 1000").as("t_last_us"),
            col("converted"))
          .orderBy("user_id")
      },
      Some("""WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
             |  JOIN s1 ON s1.user_id = e.user_id
             |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
             |  JOIN s2 ON s2.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1)
             |SELECT s1.user_id,
             |  CAST(1 + (CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END)
             |    + (CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_steps,
             |  s1.t1 AS t_first_us,
             |  COALESCE(s3.t3, s2.t2, s1.t1) AS t_last_us,
             |  (s3.t3 IS NOT NULL AND s3.t3 - s1.t1 <= 604800000000) AS converted
             |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // Cohort retention triangle: users cohorted by first active day,
    // counted at every (cohort, day-offset) they were active. The
    // oracle re-derives the distinct activity grid, the per-user
    // cohort assignment, and the offset counts.
    Q("q166_cohort_retention",
      (s, dir) => {
        Analytics.cohortRetention(Tables.events(s, dir), "user_id", "ts",
            width = 86400000000000L)
          .orderBy("cohort", "offset")
      },
      Some("""WITH active AS (SELECT DISTINCT user_id,
             |    epoch_us(ts) // 86400000000 AS bucket FROM events),
             |coh AS (SELECT user_id, MIN(bucket) AS cohort FROM active GROUP BY 1)
             |SELECT cohort, bucket - cohort AS "offset",
             |  CAST(COUNT(*) AS BIGINT) AS n_users
             |FROM active JOIN coh USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort, "offset"""".stripMargin)),

    // Corpus snapshot diff: snapshot B derives from A by removing ids
    // ≡0 (mod 7), appending ' changedmark' to surviving ids ≡0 (mod 3),
    // and adding re-keyed (+10000) copies of ids ≡0 (mod 5). corpusDiff
    // classifies every id across the full outer digest comparison; the
    // oracle re-derives the same classification from normalized-text
    // equality (digest equality ⇔ normalized equality — the module's
    // collision argument).
    Q("q167_corpus_diff",
      (s, dir) => {
        val a = Tables.documents(s, dir)
        val b = a.filter(pmod(col("doc_id"), lit(7L)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(3L)) === 0,
              concat(col("text"), lit(" changedmark"))).otherwise(col("text")))
          .unionByName(
            a.filter(pmod(col("doc_id"), lit(5L)) === 0)
              .withColumn("doc_id", col("doc_id") + 10000L))
        graft.functions.Dedup.corpusDiff(a, b, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH an AS (SELECT doc_id,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n
             |  FROM documents),
             |b0 AS (SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN text || ' changedmark' ELSE text END AS text
             |  FROM documents WHERE doc_id % 7 <> 0),
             |badd AS (SELECT doc_id + 10000 AS doc_id, text FROM documents
             |  WHERE doc_id % 5 = 0),
             |bn AS (SELECT doc_id,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n
             |  FROM (SELECT doc_id, text FROM b0 UNION ALL SELECT doc_id, text FROM badd))
             |SELECT COALESCE(an.doc_id, bn.doc_id) AS doc_id,
             |  CASE WHEN an.doc_id IS NULL THEN 'added'
             |       WHEN bn.doc_id IS NULL THEN 'removed'
             |       WHEN an.n = bn.n THEN 'unchanged'
             |       ELSE 'changed' END AS status
             |FROM an FULL OUTER JOIN bn ON an.doc_id = bn.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Fuzzy record linkage: every customer name corrupted in its last
    // digit ((d+1) mod 10 — Levenshtein distance 1 from its original),
    // matched back against the clean table blocked on nationkey, best
    // candidate per dirty record by (distance, id). The oracle
    // re-derives the corruption, the blocked candidate set, every edit
    // distance, and the ranking — unit-cost Levenshtein is
    // engine-identical by definition.
    Q("q168_fuzzy_linkage",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val dirty = c.select(col("c_custkey").as("d_id"), col("c_nationkey"),
          expr("concat(substring(c_name, 1, length(c_name)-1), " +
            "cast((cast(substring(c_name, length(c_name), 1) as int) + 1) % 10 as string))")
            .as("d_name"))
        graft.operators.Joins.fuzzyJoin(dirty,
            c.select(col("c_custkey").as("r_id"), col("c_nationkey"), col("c_name")),
            "d_id", "r_id", Seq("c_nationkey"), "d_name", "c_name",
            maxDist = 2, topPerLeft = 1)
          .orderBy("d_id")
      },
      Some("""WITH dirty AS (SELECT c_custkey AS d_id, c_nationkey,
             |    substr(c_name, 1, length(c_name) - 1) ||
             |      CAST((CAST(substr(c_name, length(c_name), 1) AS INT) + 1) % 10 AS VARCHAR) AS d_name
             |  FROM customer),
             |cand AS (SELECT d.d_id, c.c_custkey AS r_id,
             |    CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS dist
             |  FROM dirty d JOIN customer c ON c.c_nationkey = d.c_nationkey
             |  WHERE levenshtein(d.d_name, c.c_name) <= 2)
             |SELECT d_id, r_id, dist, rank FROM (
             |  SELECT d_id, r_id, dist, CAST(ROW_NUMBER() OVER (
             |      PARTITION BY d_id ORDER BY dist ASC, r_id ASC) AS BIGINT) AS rank
             |  FROM cand)
             |WHERE rank <= 1 ORDER BY d_id""".stripMargin)),

    // Data-quality validation suite over a deliberately dirtied
    // lineitem (negative quantities re-using real rows → range + pk-dup
    // violations; re-keyed rows with discount 1.5 → range + orphan-FK
    // violations): all four rule kinds — predicate window, predicate
    // range, key uniqueness, referential integrity — each violation
    // count re-derived by the oracle over the identically-constructed
    // dirty table.
    Q("q169_validate",
      (s, dir) => {
        import graft.functions.Validation._
        val base = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_discount"))
        val d1 = base.filter(pmod(col("l_orderkey"), lit(997L)) === 0)
          .withColumn("l_quantity", lit(-5.0))
        val d2 = base.filter(pmod(col("l_orderkey"), lit(499L)) === 0)
          .withColumn("l_orderkey", col("l_orderkey") + 9000000L)
          .withColumn("l_discount", lit(1.5))
        val dirty = base.unionByName(d1).unionByName(d2)
        validate(dirty, Seq(
          Check("qty_range", col("l_quantity") >= 1 && col("l_quantity") <= 50),
          Check("discount_range", col("l_discount") >= 0 && col("l_discount") <= 1),
          Unique("pk_unique", Seq("l_orderkey", "l_linenumber")),
          ForeignKey("order_fk", Seq("l_orderkey"),
            Tables.orders(s, dir), Seq("o_orderkey"))))
          .orderBy("rule_id")
      },
      Some("""WITH dirty AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, -5.0, l_discount FROM lineitem
             |  WHERE l_orderkey % 997 = 0
             |  UNION ALL
             |  SELECT l_orderkey + 9000000, l_linenumber, l_quantity, 1.5 FROM lineitem
             |  WHERE l_orderkey % 499 = 0)
             |SELECT CAST(0 AS BIGINT) AS rule_id, 'qty_range' AS rule,
             |  CAST(COUNT(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 END) AS BIGINT) AS n_violations
             |FROM dirty
             |UNION ALL
             |SELECT CAST(1 AS BIGINT), 'discount_range',
             |  CAST(COUNT(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 1) THEN 1 END) AS BIGINT)
             |FROM dirty
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), 'pk_unique',
             |  COALESCE((SELECT CAST(SUM(n) AS BIGINT) FROM (
             |    SELECT COUNT(*) AS n FROM dirty
             |    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)), 0)
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), 'order_fk',
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM dirty d
             |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = d.l_orderkey))
             |ORDER BY rule_id""".stripMargin))
  )
}
