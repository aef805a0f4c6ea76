package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 37 (round 12): web-domain curation keys
  * (registrable domain, quotas, blocklists) and cross-corpus unigram
  * KL drift.
  */
private[graft] object Batch37 {

  /** Deterministic host synthesis over the documents fixture: five
    * spellings covering plain 2-label hosts, www/cdn/deep subdomains,
    * and two-level public suffixes — the shapes registrableDomain must
    * collapse correctly. Shared by q241/q242 and their oracles. */
  private[graft] def hosts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val id = col("doc_id")
    val site = concat(lit("site"), (id % 7).cast("string"))
    Tables.documents(s, dir).select(id,
      when(id % 5 === 0, concat(lit("www."), site, lit(".com")))
        .when(id % 5 === 1, concat(lit("a.b."), site, lit(".co.uk")))
        .when(id % 5 === 2, concat(lit("cdn."), site, lit(".org")))
        .when(id % 5 === 3, concat(site, lit(".com.au")))
        .otherwise(concat(site, lit(".net"))).as("host"))
  }

  private[graft] val hostsSql =
    """SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INTEGER)
      |      WHEN 0 THEN 'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      |      WHEN 1 THEN 'a.b.site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
      |      WHEN 2 THEN 'cdn.site' || CAST(doc_id % 7 AS VARCHAR) || '.org'
      |      WHEN 3 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
      |      ELSE 'site' || CAST(doc_id % 7 AS VARCHAR) || '.net' END AS host
      |  FROM documents""".stripMargin

  private[graft] val domainSql =
    """CASE WHEN len(parts) >= 3 AND
      |      (parts[-2] || '.' || parts[-1]) IN ('co.uk', 'com.au', 'co.jp', 'org.uk', 'ac.uk', 'gov.uk', 'com.br')
      |    THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
      |    WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
      |    ELSE host END""".stripMargin

  val queries: Seq[Q] = Seq(

    // Per-domain corpus stats: subdomain collapse through
    // registrableDomain (two-level suffixes included), counts, and the
    // corpus share — the domain-quota input every web curation pipeline
    // computes. The label arithmetic is replayed by the oracle over the
    // same suffix list.
    Q("q241_domain_stats",
      (s, dir) => {
        val d = hosts(s, dir).withColumn("domain",
          graft.functions.Text.registrableDomain(col("host")))
        val tot = d.agg(count(lit(1)).as("__t"))
        d.groupBy("domain").agg(count(lit(1)).as("n_docs"))
          .crossJoin(broadcast(tot))
          .withColumn("share",
            col("n_docs").cast("double") / col("__t").cast("double"))
          .drop("__t")
          .orderBy("domain")
      },
      Some(s"""WITH u AS ($hostsSql),
              |d AS (SELECT doc_id, host, string_split(host, '.') AS parts FROM u),
              |r AS (SELECT doc_id, host, $domainSql AS domain FROM d)
              |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(COUNT(*) AS DOUBLE) / CAST((SELECT COUNT(*) FROM r) AS DOUBLE) AS share
              |FROM r GROUP BY domain ORDER BY domain""".stripMargin)),

    // Domain blocklist filter: the blocklist names REGISTRABLE domains,
    // so every subdomain spelling of a listed site is caught by exact
    // equality on the collapsed key (the reversed-prefix trick is
    // unnecessary once the key is registrable) — a broadcast join flags
    // each doc, and the per-(domain, blocked) tally is gated.
    Q("q242_domain_blocklist",
      (s, dir) => {
        import s.implicits._
        val block = Seq("site3.com", "site5.co.uk", "site1.net")
          .toDF("bdomain")
        val d = hosts(s, dir).withColumn("domain",
          graft.functions.Text.registrableDomain(col("host")))
        d.join(broadcast(block), col("domain") === col("bdomain"), "left")
          .withColumn("blocked", col("bdomain").isNotNull)
          .groupBy("domain", "blocked")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("domain", "blocked")
      },
      Some(s"""WITH u AS ($hostsSql),
              |d AS (SELECT doc_id, host, string_split(host, '.') AS parts FROM u),
              |r AS (SELECT doc_id, $domainSql AS domain FROM d),
              |b AS (SELECT unnest(['site3.com', 'site5.co.uk', 'site1.net']) AS bdomain)
              |SELECT r.domain, b.bdomain IS NOT NULL AS blocked,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs
              |FROM r LEFT JOIN b ON r.domain = b.bdomain
              |GROUP BY 1, 2 ORDER BY domain, blocked""".stripMargin)),

    // Cross-corpus unigram KL(en ‖ de): the token-distribution drift
    // score between two corpus slices — counts, union vocabulary,
    // Laplace smoothing, every log term, and the decimal sum replayed.
    Q("q243_unigram_kl",
      (s, dir) => graft.functions.Text.unigramKl(
        Tables.documents(s, dir), "text", "lang", "en", "de"),
      Some("""WITH toks AS (SELECT lang,
             |    unnest(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0)) AS tok FROM documents WHERE lang IN ('en', 'de')),
             |c AS (SELECT tok,
             |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM toks GROUP BY tok),
             |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             |    CAST(COUNT(*) AS BIGINT) AS v FROM c),
             |terms AS (SELECT na, nb, v,
             |    CAST((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
             |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
             |          / (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))) AS DECIMAL(28,12)) AS term
             |  FROM c CROSS JOIN tot)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, CAST(v AS BIGINT) AS vocab,
             |  CAST(SUM(term) AS DOUBLE) AS kl
             |FROM terms GROUP BY na, nb, v""".stripMargin))
  )
}
