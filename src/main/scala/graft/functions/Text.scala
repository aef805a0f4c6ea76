package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization/counting, quality scoring, n-gram language ID, and document
  * fingerprinting. Everything here is a pure Column expression — codegen'd,
  * no UDFs — so it runs inside WholeStageCodegen and scales linearly with
  * the scan (the only cost at 100 TB is the read itself).
  *
  * Determinism: all outputs are integers or single-rounding doubles so they
  * hash-match an independent DuckDB implementation of the same formulas.
  */
object Text {

  /** Normalize: lowercase, collapse whitespace, trim. Native expression
    * (plans.NormalizeWs): one byte-level pass instead of a per-row Java
    * regex machine — bit-identical to
    * `trim(regexp_replace(lower(text), "\\s+", " "))` (spec-asserted),
    * which remains the DuckDB-oracle formulation. */
  def normalize(text: Column): Column =
    graft.plans.HashExpressions.normalizeWs(text)

  /** Whitespace tokens of the normalized text. Empty/whitespace-only text
    * yields an empty array (Spark's split of "" returns [""], which would
    * count as one token). */
  def tokens(text: Column): Column =
    filter(split(normalize(text), " "), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space chars — a cheap stand-in for a real tokenizer's
    * piece count. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Mean token length (chars per token), as an exact ratio of longs.
    * Token-less text yields 0.0 (not NaN/null) so degenerate docs stay
    * comparable across engines. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  /** Punctuation ratio: punct chars / total chars of the normalized text.
    * Empty text yields 0.0 (a 0/0 would be NaN, and NaN comparison
    * semantics differ across engines — DuckDB orders NaN above all). */
  def punctRatio(text: Column): Column = {
    val n = normalize(text)
    when(length(n) > 0,
      size(regexp_extract_all(n, lit("[.,;:!?'\"()-]"), lit(0))).cast("double") /
        length(n).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Stopword ratio against a tiny English stopword list; 0.0 when there
    * are no tokens. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it")
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      size(filter(t, x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*))).cast("double") /
        size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: penalizes very short docs, extreme
    * punctuation, and stopword-free (unnatural) text. Single formula, two
    * divisions + one rounding — deterministic across engines. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(normalize(text)).cast("double") / 200.0, lit(1.0))
    val punct = punctRatio(text)
    val stop = stopwordRatio(text)
    lenScore * (lit(1.0) - punct) * least(stop * 5.0, lit(1.0))
  }

  /** N-gram/stopword language ID over {en, de, fr, es, zh}.
    * CJK characters dominate (zh); otherwise argmax of per-language marker
    * token hits with a fixed preference order on ties. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))
  def markerWords: Seq[(String, Seq[String])] = markers

  def langId(text: Column): Column = {
    val t = tokens(text)
    def hits(ws: Seq[String]): Column =
      size(filter(t, x => x.isin(ws.map(_.asInstanceOf[Any]): _*)))
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val scored = markers.map { case (lang, ws) => lang -> hits(ws) }
    // fixed-order argmax: strictly-greater beats earlier languages
    val best = scored.tail.foldLeft((lit(markers.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) => (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(cjk > 0, lit("zh")).otherwise(best._1)
  }

  /** Positional fingerprint: sum_i i * codepoint(char_i) mod 1e9+7 over the
    * normalized text — order-sensitive, pure integer math, identical in any
    * engine with 64-bit arithmetic. Native expression
    * (plans.Fingerprint64): one O(chars) pass — the Column formulation
    * (transform ∘ sequence ∘ substr) re-seeks the string per character,
    * O(n²) per document (spec asserts bit-identity). */
  val FpMod = 1000000007L
  def fingerprint(text: Column): Column =
    graft.plans.HashExpressions.fingerprint64(normalize(text))

  /** Corpus n-gram DOCUMENT frequency — the vocab/stopword-analysis pass:
    * for each distinct word n-gram (per-doc distinct, so a gram counts once
    * per doc), the number of documents containing it. One narrow
    * native-shingle pass + one map-side-combined aggregate keyed on the
    * gram — the same shape (and the same skew profile) as a word-count. */
  def ngramDocFreq(df: org.apache.spark.sql.DataFrame, textCol: String,
                   n: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(graft.plans.HashExpressions.shingleStrings(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))

  /** Top-k n-grams by document frequency (ties broken by gram text, so the
    * result is deterministic). The global limit after the aggregate lowers
    * to TakeOrderedAndProject — partial top-k per partition, only k rows
    * reach the driver-side merge, never a full sort. */
  def topNgrams(df: org.apache.spark.sql.DataFrame, textCol: String,
                n: Int, k: Int): org.apache.spark.sql.DataFrame =
    ngramDocFreq(df, textCol, n)
      .orderBy(col("doc_freq").desc, col("gram").asc).limit(k)
}
