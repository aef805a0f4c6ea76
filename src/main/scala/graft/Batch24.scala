package graft

import graft.SparkEntry.Q
import org.apache.spark.sql.functions._

/** Query registry batch 24 (round 11, sixth session, wave 15):
  * URL canonicalization, classifier evaluation, OHLC downsampling.
  */
private[graft] object Batch24 {

  val queries: Seq[Q] = Seq(

    // URL canonicalization — web-corpus URL dedup keys: four synthesized
    // crawl spellings per doc family (default ports upper-cased hosts,
    // tracking params, fragments, trailing slashes, duplicate param
    // names) must collapse to the canonical form the oracle re-derives
    // step for step (scheme/host lowering, :80/:443 stripping, fragment
    // drop, utm/fbclid/gclid removal, param sort, path normalization).
    Q("q208_url_canonical",
      (s, dir) => {
        val id = col("doc_id")
        val url = when(id % 4 === 0, concat(lit("HTTP://Example.COM:80/Path/"),
            id.cast("string"), lit("/?b=2&utm_source=x&a=1#frag")))
          .when(id % 4 === 1, concat(lit("https://Site.ORG:443/a/"),
            id.cast("string"), lit("/?z=9&fbclid=q&y=8")))
          .when(id % 4 === 2, lit("https://CDN.net:8443/x?a=2&a=1"))
          .otherwise(lit("http://Plain.org?utm_campaign=c#x"))
        Tables.documents(s, dir).select(id,
            url.as("url"),
            graft.functions.Text.canonicalizeUrl(url).as("canon"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (SELECT doc_id,
             |  CASE CAST(doc_id % 4 AS INTEGER)
             |    WHEN 0 THEN 'HTTP://Example.COM:80/Path/' || CAST(doc_id AS VARCHAR) || '/?b=2&utm_source=x&a=1#frag'
             |    WHEN 1 THEN 'https://Site.ORG:443/a/' || CAST(doc_id AS VARCHAR) || '/?z=9&fbclid=q&y=8'
             |    WHEN 2 THEN 'https://CDN.net:8443/x?a=2&a=1'
             |    ELSE 'http://Plain.org?utm_campaign=c#x' END AS url
             |  FROM documents),
             |parts AS (SELECT doc_id, url,
             |  lower(COALESCE(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
             |  lower(COALESCE(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')) AS authority,
             |  COALESCE(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '') AS path,
             |  COALESCE(regexp_extract(url, '^[^#]*?\?([^#]*)', 1), '') AS query
             | FROM u),
             |norm AS (SELECT doc_id, url, scheme,
             |  CASE WHEN scheme = 'http' AND authority LIKE '%:80'
             |         THEN substr(authority, 1, length(authority) - 3)
             |       WHEN scheme = 'https' AND authority LIKE '%:443'
             |         THEN substr(authority, 1, length(authority) - 4)
             |       ELSE authority END AS host,
             |  CASE WHEN path = '' THEN '/'
             |       WHEN path <> '/' AND path LIKE '%/'
             |         THEN substr(path, 1, length(path) - 1)
             |       ELSE path END AS cpath,
             |  COALESCE(array_to_string(list_sort(list_filter(string_split(query, '&'),
             |    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)='))), '&'), '') AS cquery
             | FROM parts)
             |SELECT doc_id, url,
             |  scheme || '://' || host || cpath ||
             |    CASE WHEN cquery = '' THEN '' ELSE '?' || cquery END AS canon
             |FROM norm ORDER BY doc_id""".stripMargin)),

    // Classifier evaluation: a cheap "predicted" rule (token count > 90)
    // scored against a cheap "actual" label (char length > 500), per
    // language — confusion counts exact, precision/recall/F1 pinned
    // ratios, all replayed by the oracle.
    Q("q209_confusion_metrics",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.functions.ML.confusionMetrics(d, Seq("lang"),
            actual = length(col("text")) > 500,
            predicted = graft.functions.Text.tokenCount(col("text")) > 90)
          .orderBy("lang")
      },
      Some("""WITH t AS (SELECT lang,
             |    length(text) > 500 AS a,
             |    len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             |      x -> length(x) > 0)) > 90 AS p
             |  FROM documents),
             |c AS (SELECT lang,
             |    CAST(SUM(CASE WHEN a AND p THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(SUM(CASE WHEN NOT a AND p THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(SUM(CASE WHEN a AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |    CAST(SUM(CASE WHEN NOT a AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS tn
             |  FROM t GROUP BY lang)
             |SELECT lang, tp, fp, fn, tn,
             |  CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
             |  CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
             |  CASE WHEN 2 * tp + fp + fn > 0 THEN (2.0 * CAST(tp AS DOUBLE)) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
             |FROM c ORDER BY lang""".stripMargin)),

    // Daily OHLC of purchase values per user: open/close selected on the
    // unique (ts, event_id) order, volume decimal-exact — the oracle
    // replays via ordered first/last aggregates.
    Q("q210_ohlc",
      (s, dir) => {
        graft.operators.TimeSeries.ohlc(
            Tables.events(s, dir).filter(col("event_type") === "purchase"),
            Seq("user_id"), "ts", "value", tieCol = "event_id",
            width = 86400000000000L) // 1 day in ns
          .orderBy("user_id", "bucket")
      },
      Some("""SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  first(value ORDER BY ts, event_id) AS open,
             |  MAX(value) AS high, MIN(value) AS low,
             |  last(value ORDER BY ts, event_id) AS close,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
