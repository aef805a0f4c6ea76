package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 42 (round 12): the per-domain quota sampler —
  * registrable-domain keys × A-Res priorities × per-group top-k.
  */
private[graft] object Batch42 {

  val queries: Seq[Q] = Seq(

    // Domain quota: at most 3 docs per registrable domain, drawn
    // proportional to token count — the cap that stops a boilerplate
    // farm from dominating the mixture. Domains, weights, every A-Res
    // priority, the per-group ranking with its tiebreak, and the cutoff
    // are all replayed.
    Q("q250_domain_quota_sample",
      (s, dir) => {
        val d = Batch37.hosts(s, dir)
          .join(Tables.documents(s, dir).select(col("doc_id"),
            graft.functions.Text.tokenCount(col("text")).as("wt")),
            Seq("doc_id"))
          .withColumn("domain",
            graft.functions.Text.registrableDomain(col("host")))
          .select(col("domain"), col("doc_id"), col("wt").cast("double").as("wt"))
        graft.functions.Sampling.weightedReservoirByKey(d, Seq("domain"),
            "doc_id", col("wt"), k = 3, salt = "dq")
          .select("domain", "doc_id", "wt", "priority", "rank")
          .orderBy("domain", "rank")
      },
      Some(s"""WITH u AS (${Batch37.hostsSql}),
              |w AS (SELECT doc_id,
              |    CAST(len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
              |      x -> length(x) > 0)) AS BIGINT) AS wt
              |  FROM documents),
              |d AS (SELECT u.doc_id, w.wt, string_split(u.host, '.') AS parts, u.host
              |  FROM u JOIN w ON u.doc_id = w.doc_id),
              |r AS (SELECT doc_id, CAST(wt AS DOUBLE) AS wt, ${Batch37.domainSql} AS domain
              |  FROM d WHERE wt > 0),
              |p AS (SELECT domain, doc_id, wt,
              |    ln(CAST(CAST('0x' || substr(md5('dq' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1 AS DOUBLE)
              |       / 4294967296.0) / wt AS priority
              |  FROM r),
              |rk AS (SELECT domain, doc_id, wt, priority,
              |    CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY priority DESC, doc_id ASC) AS BIGINT) AS rank
              |  FROM p)
              |SELECT domain, doc_id, wt, priority, rank FROM rk WHERE rank <= 3
              |ORDER BY domain, rank""".stripMargin))
  )
}
