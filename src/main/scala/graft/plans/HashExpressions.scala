package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expressions for the hashing hot paths of the dedup
  * operators (§ SURVEY 2.8/parity-plus).
  *
  * Rationale: the pure-`functions._` formulations of MinHash/SimHash nest
  * higher-order lambdas (transform ∘ aggregate ∘ transform) k× per row —
  * HOFs are interpreted per element, so a 400-shingle doc × 16 permutations
  * costs ~10⁵ interpreted expression evals per row. These expressions do
  * the same math in one tight JVM pass per row (single tokenizer, one
  * HashSet, k running minima). They are deterministic, partition-local
  * (no shuffle), and safe inside any plan. Each implements `doGenCode`
  * (a static-helper call), so the enclosing WholeStageCodegen span stays
  * intact — no interpreter fallback row boundary at this operator.
  */
object HashOps {
  val P: Long = 1000000007L

  /** Positional polynomial hash of a string slice: sum_i (i+1)*code_i mod P
    * (same scheme as functions.Text.fingerprint — engine-portable). */
  def sliceHash(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      h += (i - from + 1).toLong * s.charAt(i).toInt
      i += 1
    }
    h % P
  }

  /** ASCII whitespace, matching Java-regex `\s` (what Text.normalize's
    * regexp_replace uses) — NOT Character.isWhitespace, whose Unicode
    * class would tokenize differently from the Column formulation. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace tokenization of lowercased text → (string, token spans).
    * Locale.ROOT lowercasing: the default-locale toLowerCase diverges from
    * Spark's lower() under e.g. tr-TR (dotless ı), which would make
    * signatures cluster-locale-dependent. */
  def tokenSpans(raw: String): (String, Array[Int], Array[Int]) = {
    val s = raw.toLowerCase(java.util.Locale.ROOT)
    val starts = Array.newBuilder[Int]
    val ends = Array.newBuilder[Int]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        starts += i
        while (i < n && !isWs(s.charAt(i))) i += 1
        ends += i
      }
    }
    (s, starts.result(), ends.result())
  }

  /** Distinct hashes of word n-gram shingles (shingle string = tokens
    * joined by single spaces, hashed positionally — consistent with the
    * Column-based Dedup.shingleHash ∘ shingles semantics).
    *
    * `wide=false` (default): positional sum mod P — the ~30-bit universe
    * MinHash's (a·x+b) mod P permutations are built on. `wide=true`: a
    * 64-bit polynomial over the same character walk — for the inverted-
    * index Jaccard form, where a mod-P space measurably collides at
    * corpus scale (two shingles colliding merges them in every doc's
    * set) while 64-bit collisions are ~2⁻⁶⁴·pairs. */
  def shingleHashes(raw: String, n: Int, wide: Boolean = false): Array[Long] = {
    val (s, starts, ends) = tokenSpans(raw)
    val m = starts.length - n + 1
    if (m <= 0) return Array.empty
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < m) {
      // walk "tok_i tok_i+1 … tok_i+n-1" once, accumulating both schemes
      var h = 0L
      var pos = 1L
      var k = 0
      while (k < n) {
        var j = starts(i + k)
        val e = ends(i + k)
        while (j < e) {
          val c = s.charAt(j).toInt
          if (wide) h = h * 1099511628211L + c else h += pos * c
          pos += 1; j += 1
        }
        if (k < n - 1) {
          if (wide) h = h * 1099511628211L + ' '.toInt else h += pos * ' '.toInt
          pos += 1
        }
        k += 1
      }
      set.add(if (wide) h else h % P)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    out
  }

  /** Distinct word n-gram shingle STRINGS in first-occurrence order —
    * bit-identical to the Column formulation
    * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
    * element_at(tokens, i+k)...)))` (spec-asserted), in ONE pass: the HOF
    * form re-evaluates the tokenizer subtree per element_at, costing
    * O(shingles × tokens) interpreted expression evals per document —
    * measured ~19 s for a 5000-doc corpus where this pass takes well
    * under a second. */
  def shingleStringsJava(s: UTF8String, n: Int): ArrayData = {
    val (str, starts, ends) = tokenSpans(s.toString)
    val m = starts.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        sb.append(str, starts(i + k), ends(i + k))
        if (k < n - 1) sb.append(' ')
        k += 1
      }
      set.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new GenericArrayData(out)
  }

  /** ORDERED, non-distinct 64-bit shingle hashes — one entry per n-gram
    * POSITION (index i hashes tokens i..i+n−1), for positioned-gram
    * operators (shared-passage detection needs positions; the distinct
    * set forms above lose them). Wide 64-bit polynomial only: positioned
    * joins are a scale operator, and the mod-P space collides at corpus
    * scale. */
  def shingleHashesAllJava(s: UTF8String, n: Int): ArrayData = {
    val (str, starts, ends) = tokenSpans(s.toString)
    val m = starts.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var k = 0
      while (k < n) {
        var j = starts(i + k)
        val e = ends(i + k)
        while (j < e) { h = h * 1099511628211L + str.charAt(j).toInt; j += 1 }
        if (k < n - 1) h = h * 1099511628211L + ' '.toInt
        k += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ORDERED non-distinct n-gram BUCKET ids in one tokenizer pass:
    * per gram occurrence, the narrow positional hash (Σ pos·code over
    * the gram's chars and single separating spaces, 1-indexed — the
    * [[shingleHashes]] narrow scheme the q34-family oracles replay
    * char-for-char in SQL) mod P mod `buckets`. The hashed-feature
    * front end for bag-of-n-grams models (DSIR-style importance
    * weights): multiplicity is PRESERVED — a gram occurring c times
    * contributes c to its bucket. */
  def shingleBucketsAllJava(s: UTF8String, n: Int, buckets: Int): ArrayData = {
    val (str, starts, ends) = tokenSpans(s.toString)
    val m = starts.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var pos = 1L
      var k = 0
      while (k < n) {
        var j = starts(i + k)
        val e = ends(i + k)
        while (j < e) {
          h += pos * str.charAt(j).toInt
          pos += 1; j += 1
        }
        if (k < n - 1) { h += pos * ' '.toInt; pos += 1 }
        k += 1
      }
      out(i) = (h % P) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-gram repetition statistics in ONE tokenizer pass:
    * `[total, distinct, top]` where `total` = n-gram occurrences
    * (tokens−n+1, floored at 0), `distinct` = distinct n-grams, and `top` =
    * the highest occurrence count of any single n-gram. These are the
    * Gopher-style repetition signals (duplicate-fraction = 1 − distinct/
    * total; top-gram fraction = top/total) — computed per document with no
    * shuffle and no materialized non-distinct gram array (a repetitive
    * 100 k-token doc would otherwise allocate 100 k gram strings; the map
    * holds only the distinct ones). */
  def repStatsJava(s: UTF8String, n: Int): ArrayData = {
    val (str, starts, ends) = tokenSpans(s.toString)
    val m = starts.length - n + 1
    if (m <= 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder()
    var top = 0
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        sb.append(str, starts(i + k), ends(i + k))
        if (k < n - 1) sb.append(' ')
        k += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array(m.toLong, counts.size.toLong, top.toLong))
  }

  /** Shannon entropy (bits) of the CODE-POINT distribution of a string —
    * the compression-ratio-style quality signal (low ⇒ repetitive/
    * boilerplate, very high ⇒ random noise; natural prose sits ~4–5
    * bits). Engine-replayable to the hash: each term
    * −(c/n)·ln(c/n)/ln 2 rounds to a scale-12 HALF_UP decimal (the
    * psi/windowedPsi term contract — absorbs last-ulp libm divergence
    * between JVM Math.log and SQL ln), the decimal sum is EXACT (so
    * per-code-point iteration order cannot matter), one final double
    * conversion closes. Empty strings score 0. One pass, no
    * allocation beyond the distinct-code-point map. */
  def charEntropyJava(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val a = counts.get(cp)
      if (a == null) counts.put(cp, Array(1L)) else a(0) += 1
    }
    var acc = java.math.BigDecimal.ZERO
    val ln2 = Math.log(2.0)
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c.toDouble / n.toDouble
      val term = -(p * Math.log(p)) / ln2
      acc = acc.add(java.math.BigDecimal.valueOf(term)
        .setScale(12, java.math.RoundingMode.HALF_UP))
    }
    acc.doubleValue
  }

  /** Canonical stopword list — `functions.Text.stopwords` re-exports this
    * (single source of truth between the Column signals and the fused
    * native gate). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it")
  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Stopwords.foreach(s.add)
    s
  }

  /** The composite Gopher-style quality gate in ONE pass: token-count
    * window, mean-token-length window, minimum stopword ratio, maximum
    * duplicate-n-gram fraction — the same four signals as the Column
    * formulation (functions.Text.gopherKeep's spec asserts bit-equality),
    * but with a single tokenizer walk and one gram map per row instead of
    * ~10 independent evaluations of the tokens subtree: the HOF-based
    * conjunction is CodegenFallback (ArrayFilter/ArrayAggregate), which
    * both ejects the projection from WholeStageCodegen AND defeats
    * subexpression elimination (each lambda gets fresh ExprIds, so the
    * shared tokens subtree is not semantically equal across signals).
    * Signal arithmetic mirrors the Column forms exactly: mean/stop ratios
    * are 0.0 for token-less text, dup fraction is (total−distinct)/total
    * over n-gram occurrences (0.0 when no grams), and the conjunction
    * short-circuits identically (pure boolean, no nulls past the
    * null-safe wrapper). */
  def gopherKeepJava(s: UTF8String, n: Int, minTokens: Long, maxTokens: Long,
                     minMeanLen: Double, maxMeanLen: Double,
                     minStopRatio: Double, maxDupFrac: Double): Boolean = {
    val (str, starts, ends) = tokenSpans(s.toString)
    val nt = starts.length
    if (nt < minTokens || nt > maxTokens) return false
    var sumLen = 0L
    var stop = 0
    var i = 0
    while (i < nt) {
      sumLen += ends(i) - starts(i)
      if (stopSet.contains(str.substring(starts(i), ends(i)))) stop += 1
      i += 1
    }
    val ml = if (nt > 0) sumLen.toDouble / nt else 0.0
    if (!(ml >= minMeanLen && ml <= maxMeanLen)) return false
    val sr = if (nt > 0) stop.toDouble / nt else 0.0
    if (sr < minStopRatio) return false
    val m = nt - n + 1
    var df2 = 0.0
    if (m > 0) {
      val counts = new java.util.HashMap[String, Integer]()
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < m) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          sb.append(str, starts(j + k), ends(j + k))
          if (k < n - 1) sb.append(' ')
          k += 1
        }
        counts.merge(sb.toString, 1, (a, b) => a + b)
        j += 1
      }
      df2 = (m.toLong - counts.size).toDouble / m
    }
    df2 <= maxDupFrac
  }

  // --- codegen-callable entry points (static forwarders on this object) ---

  def minhashSigJava(s: UTF8String, n: Int, k: Int): ArrayData = {
    val hashes = shingleHashes(s.toString, n)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = 2L * i + 1
      val b = 104729L * (i + 1)
      var mn = Long.MaxValue
      var j = 0
      while (j < hashes.length) {
        val v = (hashes(j) * a + b) % P
        if (v < mn) mn = v
        j += 1
      }
      sig(i) = if (hashes.isEmpty) Long.MaxValue else mn
      i += 1
    }
    new GenericArrayData(sig)
  }

  def simhash64Java(s0: UTF8String): Long = {
    val (s, starts, ends) = tokenSpans(s0.toString)
    val votes = new Array[Int](62)
    var t = 0
    while (t < starts.length) {
      val h = sliceHash(s, starts(t), ends(t))
      val scrambled = h * 2654435761L
      var bit = 0
      while (bit < 62) {
        val b = (((scrambled >> bit) % 2L) + 2L) % 2L
        if (b == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 62) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  def shingleHashesJava(s: UTF8String, n: Int, wide: Boolean): ArrayData =
    new GenericArrayData(shingleHashes(s.toString, n, wide))

  /** Lowercase + collapse ASCII-whitespace runs to single spaces + trim, in
    * one byte-level pass. Bit-identical to
    * `trim(regexp_replace(lower(s), "\\s+", " "))`: lowercasing delegates
    * to UTF8String.toLowerCase (exactly Spark's `lower()`), and the six
    * Java-regex `\s` chars are all single UTF-8 bytes, never continuation
    * bytes, so the byte scan is UTF-8-safe. */
  def normalizeWsJava(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var o = 0
    var pending = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == 0x20 || c == 0x09 || c == 0x0A || c == 0x0B || c == 0x0C || c == 0x0D) {
        pending = o > 0 // a leading run is trimmed, not emitted
      } else {
        if (pending) { out(o) = 0x20; o += 1; pending = false }
        out(o) = c
        o += 1
      }
      i += 1
    }
    // a trailing run never flushes `pending` → trimmed
    UTF8String.fromBytes(out, 0, o)
  }

  /** Fraction of positions where two equal-length long arrays agree —
    * MinHash estimated similarity (matching signature fraction). */
  def eqFracJava(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"eq_frac length mismatch: $n vs ${b.numElements()}")
    if (n == 0) return 0.0
    var m = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m.toDouble / n
  }

  /** Positional fingerprint over CHARACTERS (codepoints): sum_i i·cp_i
    * mod P, 1-based — matches the Column/oracle form (`ascii`/`unicode`
    * index by character, so codePointAt iteration, not UTF-16 units;
    * the two differ beyond the BMP). */
  def fingerprintJava(s0: UTF8String): Long = {
    val s = s0.toString
    var h = 0L
    var pos = 1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h += pos * cp
      pos += 1
      i += Character.charCount(cp)
    }
    // pmod semantics: if the un-modded sum wrapped negative (gigantic
    // docs), match the Column form's non-negative result
    val m = h % P
    if (m < 0) m + P else m
  }

  /** Element-exact decimal(12,9) fixed-point: each element v becomes the
    * unscaled long of Spark's `cast(v as decimal(12,9))` — BigDecimal
    * .valueOf (shortest decimal repr, what Decimal.set(Double) uses) then
    * setScale(9, HALF_UP). Computed ONCE per vector; pair scoring then
    * never touches BigDecimal (see [[dotFix9Java]]).
    *
    * PRECONDITION (enforced, not silent): dense non-null vectors with
    * |v| < 1000. Outside that range Spark's non-ANSI `cast(v as
    * decimal(12,9))` yields NULL, so an out-of-range element would make the
    * fix9 path diverge from the decimal-HOF/oracle arithmetic it is spec-
    * asserted bit-identical to — the operators that use fix9 (exact cosine
    * scoring) document the same contract; embeddings are unit-scale, so the
    * bound is not a practical limit. */
  def fix9Java(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i),
        s"fix9: null element at $i — exact cosine requires dense non-null vectors " +
          "(cast(v as decimal(12,9)) of null has no fixed-point image)")
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      require(math.abs(v) <= 1000.0, // coarse gate so longValueExact can't overflow
        s"fix9: element $v at $i out of decimal(12,9) range — " +
          "Spark's cast would yield NULL here, so a silent fixed-point image " +
          "would diverge from the exact-decimal oracle arithmetic")
      val unscaled = java.math.BigDecimal.valueOf(v)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      // the bound is on the ROUNDED image: v in [999.9999999995, 1000)
      // passes |v| < 1000 but HALF_UP-rounds to 13 digits — exactly the
      // precision overflow where cast(v as decimal(12,9)) yields NULL
      require(math.abs(unscaled) <= 999999999999L,
        s"fix9: element $v at $i rounds outside decimal(12,9) precision — " +
          "Spark's cast would yield NULL here")
      out(i) = unscaled
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact dot product of two fix9 vectors: products are scale-18 longs
    * (may exceed 64 bits for large elements → 128-bit via multiplyHigh),
    * accumulated into a signed 128-bit (hi, lo) pair — the EXACT decimal
    * sum — then one correctly-rounded conversion to double. Bit-identical
    * to `cast(aggregate(zip_with(a, b, (x,y) -> decimal products)) as
    * double)` and to any engine's exact-decimal relational sum. */
  def dotFix9Java(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot_fix9 dim mismatch: ${a.numElements()} vs ${b.numElements()}")
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      val la = a.getLong(i)
      val lb = b.getLong(i)
      val pl = la * lb
      val ph = Math.multiplyHigh(la, lb)
      val nlo = lo + pl
      hi += ph + (if (java.lang.Long.compareUnsigned(nlo, lo) < 0) 1L else 0L)
      lo = nlo
      i += 1
    }
    if (hi == 0L && lo >= 0L) new java.math.BigDecimal(java.math.BigInteger.valueOf(lo), 18).doubleValue()
    else if (hi == -1L && lo < 0L) new java.math.BigDecimal(java.math.BigInteger.valueOf(lo), 18).doubleValue()
    else {
      val big = java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
      new java.math.BigDecimal(big, 18).doubleValue()
    }
  }

  /** Unicode accent folding: NFD-decompose, drop every combining mark
    * (categories Mn/Mc/Me — Java-regex `\p{M}`), NFC-recompose. Matches
    * DuckDB's `strip_accents` (utf8proc decompose + STRIPMARK) on every
    * decomposable Latin/Greek/Cyrillic accent; chars with no canonical
    * decomposition (ø, đ, …) pass through unchanged in BOTH engines.
    * ASCII fast path returns the input UTF8String without allocating. */
  def foldAccentsJava(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        val str = s.toString
        val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var j = 0
        while (j < nfd.length) {
          val c = nfd.charAt(j)
          val t = Character.getType(c)
          if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
              t != Character.ENCLOSING_MARK) sb.append(c)
          j += 1
        }
        return UTF8String.fromString(
          java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s // pure ASCII: no mark can exist, input returned as-is
  }

  /** Sparse ±1 sign projection of a fix9 vector image: out_j =
    * Σ_i sign(j,i)·fix9(v_i), accumulated EXACTLY in long arithmetic
    * (|fix9| ≤ 1e12 and dims ≤ ~10⁵ keep the sum far inside 2^63 — the
    * require below guards the bound), then ONE correctly-rounded
    * conversion to double per output dim — bit-identical to any engine's
    * `cast(sum(sign * cast(v as decimal(12,9))) as double)`. */
  def sparseProjectJava(arr: ArrayData, signs: Array[Array[Int]],
                        isFloat: Boolean): ArrayData = {
    val dim = if (signs.length > 0) signs(0).length else 0
    require(arr.numElements() == dim,
      s"sparse_project dim mismatch: vector has ${arr.numElements()} elements, expected $dim")
    require(dim <= 1000000, s"sparse_project: dim $dim could overflow the long accumulator")
    val img = fix9Java(arr, isFloat)
    val out = new Array[Double](signs.length)
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      var sum = 0L
      var i = 0
      while (i < dim) {
        val sg = row(i)
        if (sg != 0) sum += (if (sg > 0) img.getLong(i) else -img.getLong(i))
        i += 1
      }
      out(j) = new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 9).doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  def rhpSigJava(arr: ArrayData, coeffs: Array[Array[Double]], isFloat: Boolean): Long = {
    val bits = coeffs.length
    val dim = if (bits > 0) coeffs(0).length else 0
    require(arr.numElements() == dim,
      s"rhp_signature dim mismatch: vector has ${arr.numElements()} elements, expected $dim " +
        "— a silent truncation would quietly degrade ANN recall")
    val n = dim
    var sig = 0L
    var b = 0
    while (b < bits) {
      val c = coeffs(b)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += v * c(i)
        i += 1
      }
      if (proj > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private def vecDoubles(arr: ArrayData, isFloat: Boolean): Array[Double] =
    if (isFloat) {
      val n = arr.numElements()
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = arr.getFloat(i).toDouble; i += 1 }
      out
    } else arr.toDoubleArray()

  /** IVF cell routing: argmax dot(vec, centroid) over the unit-centroid
    * matrix — ties → lowest cell (exactly the UDF semantics this
    * replaced; the recall/degeneration specs pin equivalence). */
  /** Bloom probe on the UTF-8 byte image — the insertion domain of
    * `stat.bloomFilter` over a string column (BloomFilterImpl hashes the
    * raw bytes for both put and mightContain). */
  def bloomContainsJava(s: UTF8String,
                        bf: org.apache.spark.util.sketch.BloomFilter): Boolean =
    bf.mightContainBinary(s.getBytes)

  /** Bloom probe on the long image — the insertion domain of
    * `stat.bloomFilter` over an integral column (BloomFilterImpl.putLong). */
  def bloomContainsLongJava(v: Long,
                            bf: org.apache.spark.util.sketch.BloomFilter): Boolean =
    bf.mightContainLong(v)

  def nearestCellJava(arr: ArrayData, isFloat: Boolean,
                      centroids: Array[Array[Double]]): Int = {
    val v = vecDoubles(arr, isFloat)
    var best = 0; var bestDot = Double.NegativeInfinity; var ci = 0
    while (ci < centroids.length) {
      val c = centroids(ci)
      var d = 0.0; var j = 0
      val len = math.min(c.length, v.length)
      while (j < len) { d += c(j) * v(j); j += 1 }
      if (d > bestDot) { bestDot = d; best = ci }
      ci += 1
    }
    best
  }

  /** IVF probe list: `nprobe` cell ids by centroid dot descending, ties →
    * lowest cell. */
  def topCellsJava(arr: ArrayData, isFloat: Boolean,
                   centroids: Array[Array[Double]], nprobe: Int): ArrayData = {
    val v = vecDoubles(arr, isFloat)
    val n = centroids.length
    val dots = new Array[Double](n)
    var ci = 0
    while (ci < n) {
      val c = centroids(ci)
      var d = 0.0; var j = 0
      val len = math.min(c.length, v.length)
      while (j < len) { d += c(j) * v(j); j += 1 }
      dots(ci) = d
      ci += 1
    }
    val order = Array.tabulate(n)(identity).sortBy(i => (-dots(i), i))
    new GenericArrayData(order.take(math.min(nprobe, n)))
  }

  /** PQ codes: per subspace, L2-nearest codebook entry (strict `<` keeps
    * the LOWEST index on ties — the same rule as the HOF formulation's
    * array_position-of-first-minimum); distances accumulate in ascending
    * t order, so the doubles are bit-identical to the zip_with fold. */
  def pqCodesJava(arr: ArrayData, isFloat: Boolean,
                  codebooks: Array[Array[Array[Double]]],
                  subDim: Int): ArrayData = {
    val v = vecDoubles(arr, isFloat)
    val m = codebooks.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j); val off = j * subDim
      var best = 0; var bestD = Double.PositiveInfinity; var ci = 0
      while (ci < cb.length) {
        val c = cb(ci)
        var d = 0.0; var t = 0
        val len = math.min(subDim, math.max(v.length - off, 0))
        while (t < len) { val x = v(off + t) - c(t); d += x * x; t += 1 }
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      out(j) = best; j += 1
    }
    new GenericArrayData(out)
  }
}

/** minhash_sig(text): k-permutation MinHash signature over word n-gram
  * shingles, one pass per row. h_i(x) = (a_i·x + b_i) mod P with the same
  * deterministic (a_i, b_i) as functions.Dedup.minhashSignature. */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && k >= 1,
    s"minhash_sig needs n-gram size >= 1 and signature length >= 1, got n=$n k=$k")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.minhashSigJava(input.asInstanceOf[UTF8String], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.minhashSigJava($c, $n, $k);")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** simhash64(text): 62-bit SimHash over whitespace tokens — per-token
  * positional hash scrambled per bit (same vote rule as the Column
  * formulation in functions.Dedup.simhash). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.simhash64Java(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.simhash64Java($c);")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** shingle_strings(text, n): distinct word n-gram shingles of the
  * normalized text, one tokenizer pass per row (see
  * HashOps.shingleStringsJava). */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle n-gram size must be >= 1, got $n")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.shingleStringsJava(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.shingleStringsJava($c, $n);")
  override protected def withNewChildInternal(c: Expression): ShingleStrings = copy(child = c)
  override def prettyName: String = "shingle_strings"
}

/** shingle_hashes_all(text, n): ORDERED non-distinct 64-bit shingle
  * hashes, index = n-gram position (see HashOps.shingleHashesAllJava). */
case class ShingleHashesAll(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle n-gram size must be >= 1, got $n")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.shingleHashesAllJava(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.shingleHashesAllJava($c, $n);")
  override protected def withNewChildInternal(c: Expression): ShingleHashesAll = copy(child = c)
  override def prettyName: String = "shingle_hashes_all"
}

/** shingle_buckets_all(text, n, buckets): ORDERED non-distinct hashed
  * n-gram bucket ids, multiplicity preserved (see
  * HashOps.shingleBucketsAllJava). */
case class ShingleBucketsAll(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle n-gram size must be >= 1, got $n")
  require(buckets >= 1, s"bucket count must be >= 1, got $buckets")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.shingleBucketsAllJava(input.asInstanceOf[UTF8String], n, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.shingleBucketsAllJava($c, $n, $buckets);")
  override protected def withNewChildInternal(c: Expression): ShingleBucketsAll = copy(child = c)
  override def prettyName: String = "shingle_buckets_all"
}

/** rep_stats(text, n): per-document word n-gram repetition statistics
  * `[total, distinct, top]` (see HashOps.repStatsJava) — the narrow scan
  * half of Gopher-style repetition filtering. */
case class RepStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"rep_stats n-gram size must be >= 1, got $n")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.repStatsJava(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.repStatsJava($c, $n);")
  override protected def withNewChildInternal(c: Expression): RepStats = copy(child = c)
  override def prettyName: String = "rep_stats"
}

/** char_entropy(text): code-point Shannon entropy in bits (see
  * HashOps.charEntropyJava) — the compression-proxy quality signal,
  * codegen'd so it rides WholeStageCodegen in curation projections. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      HashOps.charEntropyJava(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.charEntropyJava($c);")
  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
  override def prettyName: String = "char_entropy"
}

/** gopher_keep(text): the composite Gopher-style quality gate fused into
  * one codegen'd native expression (see HashOps.gopherKeepJava) — keeps a
  * curation projection inside WholeStageCodegen where the HOF-based
  * conjunction is CodegenFallback, and does one tokenizer pass instead of
  * ~10. Threshold params are plan constants (embedded in generated code),
  * hence required finite. */
case class GopherKeep(child: Expression, n: Int,
                      minTokens: Long, maxTokens: Long,
                      minMeanLen: Double, maxMeanLen: Double,
                      minStopRatio: Double, maxDupFrac: Double)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"gopher_keep n-gram size must be >= 1, got $n")
  require(!minMeanLen.isNaN && !minMeanLen.isInfinite &&
    !maxMeanLen.isNaN && !maxMeanLen.isInfinite &&
    !minStopRatio.isNaN && !minStopRatio.isInfinite &&
    !maxDupFrac.isNaN && !maxDupFrac.isInfinite,
    "gopher_keep thresholds must be finite (they are codegen literals)")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  // NULL text gates to FALSE, not null — matching the HOF conjunction's
  // observed three-valued collapse (the mean-length window's otherwise(0.0)
  // arm makes one conjunct definitively false, and null AND false = false),
  // so the fused gate is a drop-in for the round-6 semantics and the
  // expression is non-nullable (filters and projections see a plain bool).
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    java.lang.Boolean.valueOf(v != null &&
      HashOps.gopherKeepJava(v.asInstanceOf[UTF8String], n, minTokens,
        maxTokens, minMeanLen, maxMeanLen, minStopRatio, maxDupFrac))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.plans.HashOps.gopherKeepJava(${childGen.value}, $n,
            ${minTokens}L, ${maxTokens}L, ${minMeanLen}D, ${maxMeanLen}D,
            ${minStopRatio}D, ${maxDupFrac}D);
        }""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): GopherKeep = copy(child = c)
  override def prettyName: String = "gopher_keep"
}

/** shingle_hashes(text): the distinct shingle-hash set itself (for Jaccard
  * estimation / inverted indexes over hashed shingles at scale — shuffling
  * 8-byte hashes instead of shingle strings). `wide` selects the 64-bit
  * polynomial (inverted-index form) over the mod-P MinHash universe. */
case class ShingleHashes(child: Expression, n: Int, wide: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle n-gram size must be >= 1, got $n")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.shingleHashesJava(input.asInstanceOf[UTF8String], n, wide)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.shingleHashesJava($c, $n, $wide);")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** fix9(vec): exact decimal(12,9) fixed-point image of a float/double
  * vector, as unscaled longs — the once-per-vector half of the native
  * exact-cosine path (see HashOps.fix9Java). */
case class Fix9(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fix9 expects array<float> or array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    HashOps.fix9Java(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.fix9Java($c, $isFloat);")
  override protected def withNewChildInternal(c: Expression): Fix9 = copy(child = c)
  override def prettyName: String = "fix9"
}

/** dot_fix9(a, b): exact decimal dot product of two fix9 vectors →
  * correctly-rounded double (see HashOps.dotFix9Java). */
case class DotFix9(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      HashOps.dotFix9Java(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HashOps.dotFix9Java($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFix9 =
    copy(left = l, right = r)
  override def prettyName: String = "dot_fix9"
}

/** eq_frac(a, b): matching-element fraction of two long arrays — the
  * MinHash est_sim, one tight loop instead of a zip_with/filter HOF per
  * candidate pair. */
case class EqFrac(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      HashOps.eqFracJava(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HashOps.eqFracJava($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): EqFrac =
    copy(left = l, right = r)
  override def prettyName: String = "eq_frac"
}

/** fingerprint64(text): positional codepoint fingerprint mod 1e9+7 — one
  * O(chars) pass; the Column formulation (transform ∘ sequence ∘ substr)
  * re-seeks the string per character, O(n²) per document. */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.fingerprintJava(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.fingerprintJava($c);")
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)
  override def prettyName: String = "fingerprint64"
}

/** normalize_ws(text): lowercase + whitespace-collapse + trim in one
  * byte-level pass — the normalization under every text/dedup operator.
  * Replaces a per-row Java-regex `\s+` machine with a branch-per-byte
  * loop (same output, asserted against the regex form in the spec). */
case class NormalizeWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashOps.normalizeWsJava(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.normalizeWsJava($c);")
  override protected def withNewChildInternal(c: Expression): NormalizeWs = copy(child = c)
  override def prettyName: String = "normalize_ws"
}

/** fold_accents(text): NFD → strip combining marks (`\p{M}`) → NFC —
  * the canonical-key normalization under cross-script dedup. Matches
  * DuckDB `strip_accents` on decomposable accents (see
  * HashOps.foldAccentsJava); the ASCII fast path makes the common case
  * (clean web text) allocation-free. */
case class FoldAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashOps.foldAccentsJava(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.foldAccentsJava($c);")
  override protected def withNewChildInternal(c: Expression): FoldAccents = copy(child = c)
  override def prettyName: String = "fold_accents"
}

/** sparse_project(vec): k exact sign-projection sums of the fix9 image —
  * Achlioptas-style random projection with the ±1/0 matrix attached as a
  * codegen REFERENCE object (the NearestCell pattern: never inlined into
  * generated source). One pass per row; each output dim is a long sum +
  * one rounding (see HashOps.sparseProjectJava). */
case class SparseSignProject(child: Expression, signs: Array[Array[Int]])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sparse_project expects array<float> or array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    HashOps.sparseProjectJava(input.asInstanceOf[ArrayData], signs, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("projSigns", signs, "int[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.sparseProjectJava($c, $signsRef, $isFloat);")
  }
  override protected def withNewChildInternal(c: Expression): SparseSignProject = copy(child = c)
  override def prettyName: String = "sparse_project"
}

/** rhp_signature(vec): b sign-bits of deterministic pseudo-random
  * hyperplane projections, packed into a long — the ANN bucketing hash.
  * One pass over the vector per row (the Column formulation builds a
  * bits×dim element_at tree whose codegen compile time dominates). */
case class RhpSignature(child: Expression, dim: Int, bits: Int, seed: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rhp_signature expects array<float> or array<double>, got $other")
    }
  override def dataType: DataType = LongType
  private lazy val coeffs: Array[Array[Double]] =
    Array.tabulate(bits, dim) { (b, i) =>
      var z = ((b.toLong + seed.toLong * 31) * 1610612741L +
        i.toLong * 805306457L + 2654435769L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z % 1000003L).toDouble / 1000003.0
    }
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashOps.rhpSigJava(input.asInstanceOf[ArrayData], coeffs, isFloat))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coeffsRef = ctx.addReferenceObj("rhpCoeffs", coeffs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.rhpSigJava($c, $coeffsRef, $isFloat);")
  }
  override protected def withNewChildInternal(c: Expression): RhpSignature = copy(child = c)
  override def prettyName: String = "rhp_signature"
}

/** nearest_cell(vec): argmax-dot assignment of a vector against a
  * unit-norm centroid matrix — the IVF coarse-quantizer routing step,
  * once per corpus row in the scan. The matrix is attached as a codegen
  * REFERENCE object (one copy per task binary, which the scheduler
  * already broadcasts) — never inlined into generated source (nlist×dim
  * literal constants would blow past JIT method limits at real dims) and
  * no UDF Seq boxing: the row's vector is read once into a primitive
  * array. Ties → lowest cell; zero vectors land in cell 0 (dot 0 beats
  * the -∞ sentinel at index 0). Dense non-null vectors expected (same
  * domain as the scoring path). */
/** bloom_might_contain(s): membership probe of a string against a
  * driver-built Bloom filter ([[org.apache.spark.util.sketch.BloomFilter]],
  * Serializable) riding the codegen REFERENCE array like [[NearestCell]]'s
  * centroid matrix — shipped once per task binary, no UDF boxing on the
  * corpus-shingle hot path. Probes the UTF-8 BYTES directly (the same
  * image `DataFrameStatFunctions.bloomFilter` inserted for a string
  * column), so no per-row String materialization. May return true for an
  * absent key (FP rate set at build); never false for a present one —
  * callers must re-verify positives exactly (see
  * `Dedup.contaminationScoresBloom`). */
/** Probe against a BROADCAST Bloom filter (round 20, r19 VERDICT #6):
  * the sketch used to sit in the expression as a raw reference object,
  * serialized into EVERY stage's task binary that referenced it —
  * ~100 MB per task set at the triangle gate boundary. As a
  * `Broadcast`, the task binary carries only the broadcast handle and
  * executors fetch the sketch once via the torrent protocol. */
case class BloomMightContain(child: Expression,
                             bcast: org.apache.spark.broadcast.Broadcast[
                               org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects string or bigint (the two insertion " +
            s"domains of stat.bloomFilter), got $other")
    }
  override def dataType: DataType = BooleanType
  private def isLong: Boolean = child.dataType == LongType
  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    bcast.value
  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      if (isLong) HashOps.bloomContainsLongJava(input.asInstanceOf[Long], filter)
      else HashOps.bloomContainsJava(input.asInstanceOf[UTF8String], filter))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBcast", bcast,
      "org.apache.spark.broadcast.Broadcast")
    // resolve the broadcast ONCE per codegen'd partition object, not
    // per row: a mutable-state member initialized from the handle
    val fRef = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bRef.value();")
    val fn = if (isLong) "bloomContainsLongJava" else "bloomContainsJava"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.$fn($c, $fRef);")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell expects array<float> or array<double>, got $other")
    }
  override def dataType: DataType = IntegerType
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      HashOps.nearestCellJava(input.asInstanceOf[ArrayData], isFloat, centroids))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.nearestCellJava($c, $isFloat, $cRef);")
  }
  override protected def withNewChildInternal(c: Expression): NearestCell = copy(child = c)
  override def prettyName: String = "nearest_cell"
}

/** pq_codes(vec): the m per-subspace L2-nearest codebook indices — PQ
  * encode as ONE codegen'd pass per row (the HOF formulation evaluates
  * k aggregate lambdas per subspace per row, interpreted). Codebooks ride
  * the codegen reference array like [[NearestCell]]'s centroids; output
  * doubles and tie-breaks are bit-identical to the HOF form
  * (spec-pinned). */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]],
                   subDim: Int)
    extends UnaryExpression {
  require(codebooks.nonEmpty && subDim >= 1,
    s"pq_codes needs ≥1 subspace codebook and subDim ≥ 1, got " +
      s"${codebooks.length} and $subDim")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes expects array<float> or array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    HashOps.pqCodesJava(input.asInstanceOf[ArrayData], isFloat, codebooks, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.pqCodesJava($c, $isFloat, $cbRef, $subDim);")
  }
  override protected def withNewChildInternal(c: Expression): PqCodes = copy(child = c)
  override def prettyName: String = "pq_codes"
}

/** top_cells(vec): the `nprobe` cell ids nearest a query vector (centroid
  * dot descending, ties → lowest cell) — the IVF probe list. Same
  * reference-object centroid transport as [[NearestCell]]. */
case class TopCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_cells expects array<float> or array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    HashOps.topCellsJava(input.asInstanceOf[ArrayData], isFloat, centroids, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashOps.topCellsJava($c, $isFloat, $cRef, $nprobe);")
  }
  override protected def withNewChildInternal(c: Expression): TopCells = copy(child = c)
  override def prettyName: String = "top_cells"
}

object HashExpressions {
  import ColumnBridge.{column, expression}
  def bloomMightContain(c: Column,
                        bf: org.apache.spark.broadcast.Broadcast[
                          org.apache.spark.util.sketch.BloomFilter]): Column =
    column(BloomMightContain(expression(c), bf))
  def nearestCell(c: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCell(expression(c), centroids))
  def topCells(c: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    column(TopCells(expression(c), centroids, nprobe))
  def pqCodes(c: Column, codebooks: Array[Array[Array[Double]]], subDim: Int): Column =
    column(PqCodes(expression(c), codebooks, subDim))
  def minhashSig(c: Column, n: Int, k: Int): Column = column(MinHashSig(expression(c), n, k))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def shingleHashes(c: Column, n: Int, wide: Boolean = false): Column =
    column(ShingleHashes(expression(c), n, wide))
  def shingleStrings(c: Column, n: Int): Column =
    column(ShingleStrings(expression(c), n))
  def repStats(c: Column, n: Int): Column = column(RepStats(expression(c), n))
  def charEntropy(c: Column): Column = column(CharEntropy(expression(c)))
  def gopherKeep(c: Column, n: Int, minTokens: Long, maxTokens: Long,
                 minMeanLen: Double, maxMeanLen: Double,
                 minStopRatio: Double, maxDupFrac: Double): Column =
    column(GopherKeep(expression(c), n, minTokens, maxTokens,
      minMeanLen, maxMeanLen, minStopRatio, maxDupFrac))
  def shingleHashesAll(c: Column, n: Int): Column =
    column(ShingleHashesAll(expression(c), n))
  def shingleBucketsAll(c: Column, n: Int, buckets: Int): Column =
    column(ShingleBucketsAll(expression(c), n, buckets))
  def normalizeWs(c: Column): Column = column(NormalizeWs(expression(c)))
  def foldAccents(c: Column): Column = column(FoldAccents(expression(c)))
  def sparseProject(c: Column, signs: Array[Array[Int]]): Column =
    column(SparseSignProject(expression(c), signs))
  def fix9(c: Column): Column = column(Fix9(expression(c)))
  def dotFix9(a: Column, b: Column): Column = column(DotFix9(expression(a), expression(b)))
  def eqFrac(a: Column, b: Column): Column = column(EqFrac(expression(a), expression(b)))
  def fingerprint64(c: Column): Column = column(Fingerprint64(expression(c)))
  def rhpSignature(c: Column, dim: Int, bits: Int, seed: Int): Column =
    column(RhpSignature(expression(c), dim, bits, seed))
}
