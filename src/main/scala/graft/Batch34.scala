package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 34 (round 12): unigram-LM quality scoring and
  * PII redaction — two release-gate passes of a training-data pipeline.
  */
private[graft] object Batch34 {

  val queries: Seq[Q] = Seq(

    // Unigram LM perplexity proxy: every document scored by its average
    // token negative log-likelihood under the corpus's own unigram
    // distribution. The LM counts, N, every −ln p term (decimal-cast),
    // the per-doc sums, and the final division are all replayed.
    Q("q234_unigram_nll",
      (s, dir) => graft.functions.Text.unigramNll(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id,
             |    unnest(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0)) AS tok FROM documents),
             |lm AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM lm),
             |scored AS (SELECT t.doc_id,
             |    CAST(-ln(CAST(lm.c AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12)) AS nll
             |  FROM toks t JOIN lm ON t.tok = lm.tok CROSS JOIN n)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             |  CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_nll
             |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // PII redaction end to end: synthetic emails/phones/IPs are injected
    // deterministically into every third doc (the fixture corpus is
    // clean), then the scrub pass must (a) count each PII class exactly
    // and (b) produce the byte-identical redacted text — both replayed
    // by the oracle running the same engine-portable regexes in the
    // same order.
    Q("q235_redact_pii",
      (s, dir) => {
        val id = col("doc_id")
        val injected = when(id % 3 === 0, concat(col("text"),
            lit(" contact user"), id.cast("string"), lit("@example.com or 555-"),
            substring((lit(10000) + id % 10000).cast("string"), 2, 4),
            lit(" at 10.0."), (id % 256).cast("string"), lit(".7")))
          .otherwise(col("text"))
        Tables.documents(s, dir)
          .select(id, injected.as("t"))
          .select((id +: graft.functions.Text.piiCounts(col("t"))) :+
            graft.functions.Text.redactPii(col("t")).as("redacted"): _*)
          .orderBy("doc_id")
      },
      Some("""WITH inj AS (SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
             |      || '@example.com or 555-' || substr(CAST(10000 + doc_id % 10000 AS VARCHAR), 2, 4)
             |      || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
             |    ELSE text END AS t FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phone,
             |  CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |      '\b555-[0-9]{4}\b', '<PHONE>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
             |FROM inj ORDER BY doc_id""".stripMargin))
  )
}
