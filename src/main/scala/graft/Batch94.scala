package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 94 (round 19, continuation wave S): the KM
  * survival quantile (median time-to-convert) and cross-corpus n-gram
  * coverage.
  */
private[graft] object Batch94 {

  val queries: Seq[Q] = Seq(

    // Median time-to-first-purchase off the censoring-correct KM curve
    // (the q326 subjects): the quantized-log chain plus one
    // conditional min — DuckDB replays the curve and picks the same
    // first crossing.
    Q("q484_survival_quantile",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val per = e.groupBy("user_id")
          .agg(min("ts").as("t0"), max("ts").as("t1"))
        val p = e.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("tp"))
        val subj = per.join(p, Seq("user_id"), "left")
          .select(
            when(col("tp").isNotNull,
              expr("(tp - t0) div 3600000000000"))
              .otherwise(expr("(t1 - t0) div 3600000000000")).as("dur"),
            col("tp").isNotNull.as("ev"))
        graft.operators.Analytics.survivalQuantile(subj, "dur",
          col("ev"), p = 0.5)
      },
      Some("""WITH per AS (SELECT user_id, MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
             |  FROM events GROUP BY 1),
             |p AS (SELECT user_id, MIN(epoch_us(ts)) AS tp FROM events
             |  WHERE event_type = 'purchase' GROUP BY 1),
             |subj AS (SELECT CASE WHEN p.tp IS NOT NULL
             |    THEN (p.tp - per.t0) // 3600000000
             |    ELSE (per.t1 - per.t0) // 3600000000 END AS dur,
             |    p.tp IS NOT NULL AS ev
             |  FROM per LEFT JOIN p ON per.user_id = p.user_id),
             |c AS (SELECT CAST(dur AS DOUBLE) AS t,
             |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
             |    CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
             |  FROM subj GROUP BY 1),
             |n AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM c),
             |r AS (SELECT t, d, c,
             |    n.n - COALESCE(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS risk
             |  FROM c, n),
             |tm AS (SELECT t, d, risk,
             |    CASE WHEN d > 0 AND d < risk
             |      THEN CAST(CAST(ln(1.0 - CAST(d AS DOUBLE) / CAST(risk AS DOUBLE)) AS DECIMAL(28,12)) * 1000000000000 AS BIGINT)
             |      ELSE 0 END AS q,
             |    CASE WHEN d > 0 AND d = risk THEN 1 ELSE 0 END AS z
             |  FROM r),
             |cum AS (SELECT t, d,
             |    SUM(q) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS sq,
             |    SUM(z) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS sz
             |  FROM tm),
             |ev AS (SELECT t, d,
             |    CASE WHEN sz > 0 THEN 0.0
             |      ELSE exp(CAST(sq AS DOUBLE) / 1e12) END AS sincl
             |  FROM cum WHERE d > 0),
             |a AS (SELECT CAST(COALESCE(SUM(d), 0) AS BIGINT) AS events,
             |    MIN(CASE WHEN sincl <= 1.0 - 0.5 THEN t END) AS quantile
             |  FROM ev),
             |nn AS (SELECT CAST(COALESCE(SUM(d + c), 0) AS BIGINT) AS n FROM c)
             |SELECT CAST(0.5 AS DOUBLE) AS p, nn.n, a.events,
             |  CASE WHEN nn.n > 0 THEN a.quantile END AS quantile,
             |  CASE WHEN nn.n > 0 THEN a.quantile IS NOT NULL END AS reached
             |FROM a CROSS JOIN nn""".stripMargin)),

    // Does the English corpus cover the French documents' 3-gram
    // vocabulary? (It mostly should not - the point of the fixture.)
    // Both shingle sets use the q93 tokenization; the gram-keyed left
    // join and both shares replay exactly.
    Q("q485_ngram_coverage",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.functions.Text.ngramCoverage(
          docs.filter(col("lang") === "fr"),
          docs.filter(col("lang") === "en"), "text", n = 3)
      },
      Some("""WITH ttoks AS (SELECT doc_id,
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
             |  FROM documents WHERE lang = 'fr'),
             |tsh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
             |  FROM ttoks),
             |tg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM tsh GROUP BY 1),
             |ctoks AS (SELECT doc_id,
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
             |  FROM documents WHERE lang = 'en'),
             |csh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, GREATEST(len(t) - 2, 0) + 1),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
             |  FROM ctoks),
             |cg AS (SELECT DISTINCT g AS cgr FROM csh),
             |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_target_grams,
             |    CAST(SUM(CASE WHEN cg.cgr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
             |    CAST(COALESCE(SUM(df), 0) AS BIGINT) AS df_total,
             |    CAST(COALESCE(SUM(CASE WHEN cg.cgr IS NOT NULL THEN df ELSE 0 END), 0) AS BIGINT) AS df_covered
             |  FROM tg LEFT JOIN cg ON tg.g = cg.cgr)
             |SELECT n_target_grams, n_covered,
             |  CASE WHEN n_target_grams > 0
             |    THEN CAST(n_covered AS DOUBLE) / CAST(n_target_grams AS DOUBLE) END AS coverage,
             |  df_total, df_covered,
             |  CASE WHEN df_total > 0
             |    THEN CAST(df_covered AS DOUBLE) / CAST(df_total AS DOUBLE) END AS mass_coverage
             |FROM f""".stripMargin))
  )
}
