package graft.functions.expr

import graft.functions.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression forms of the text-analysis functions (language-ID
  * and winnowing fingerprints) — same kernels as the UDF twins in
  * [[graft.functions.TextAnalysis]], minus the UDF encode/decode
  * boundary (Seq boxing + Row wrapping per call). */
object TextKernels {
  def langId(text: UTF8String): InternalRow = {
    val p = TextAnalysis.langIdImpl(if (text == null) "" else text.toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(p.lang), p.confidence))
  }

  def winnow(text: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(
      TextAnalysis.winnowImpl(if (text == null) null else text.toString, k, w))

  /** C4/Gopher-style quality gate as ONE kernel call: token count in
    * [minTok, maxTok], type-token ratio ≥ minTtr, top-bigram share ≤
    * maxRep. Bit-identical to the column-expression form (`size(t)`,
    * `size(array_distinct(t))/n`, `longestRun(array_sort(bigrams))/
    * (n-1)`): same single-space split (limit -1), same int/int IEEE
    * divisions, and max bigram multiplicity == longest equal run of the
    * sorted bigram array. Exists because FilterExec does no
    * subexpression elimination — a lambda-form gate predicate re-splits
    * the text per element access (O(len²) per row inside a filter),
    * while this is one O(len) call. */
  def qualityGate(text: UTF8String, minTok: Int, maxTok: Int,
      minTtr: Double, maxRep: Double): Boolean = {
    val s = if (text == null) "" else text.toString
    val toks = s.split(" ", -1)
    val n = toks.length
    if (n < minTok || n > maxTok) return false
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { seen.add(toks(i)); i += 1 }
    if (seen.size.toDouble / n.toDouble < minTtr) return false
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer]()
      var best = 0
      var j = 0
      while (j < n - 1) {
        val bg = toks(j) + " " + toks(j + 1)
        val c = counts.merge(bg, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
        if (c > best) best = c
        j += 1
      }
      if (best.toDouble / (n - 1).toDouble > maxRep) return false
    }
    true
  }

  /** Canonical text fold (q165's normalization) as ONE pass: lowercase,
    * map every char outside [a-z0-9] to a separator, emit single spaces
    * between kept runs — trim and run-collapse fall out of the walk.
    * Semantically identical to the three-regex chain
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", " "),
    * " +", " "))` (NormalizeFoldSpec proves it on adversarial inputs):
    * a surrogate pair naively yields two separators where the regex's
    * code-point match yields one, but both collapse to the same single
    * space, so a UTF-16 char walk is exact. One kernel call replaces
    * three compiled-regex passes + two intermediate string allocations
    * per row: measured ~15x faster than the chain on a pure
    * normalization pass (0.14-0.23 s vs 2.3-2.4 s over 50k warm cached
    * docs, local[32]) — the margin that matters on a map-side pass over
    * 100 TB of text, though inside q165 itself md5 + the fingerprint
    * shuffle dominate and the two forms time equally.
    * Lowercasing goes through `UTF8String.toLowerCase` (what Spark's
    * own `lower()` calls), never the default-locale JVM one. */
  def normalizeFold(text: UTF8String): UTF8String = {
    val s = (if (text == null) UTF8String.EMPTY_UTF8 else text).toLowerCase.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSep = false
    var started = false
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) {
        if (pendingSep && started) sb.append(' ')
        sb.append(ch)
        started = true
        pendingSep = false
      } else pendingSep = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Unicode-aware canonical fold — the CCNet/Dolma-class superset of
    * [[normalizeFold]] for corpora that aren't clean ASCII: NFKC
    * compatibility normalization (ligature fi→fi, fullwidth Ａ→A,
    * NBSP/ideographic space→space, math alphanumerics 𝐀→A), full
    * lowercase via `String.toLowerCase(Locale.ROOT)` (final-sigma and
    * other SpecialCasing rules, never the default locale), then NFD
    * decomposition with combining marks DROPPED (é→e, harakat strip) —
    * a mark glues to its base, it never becomes a separator. The final
    * walk keeps Unicode letters/digits (CJK survives, unlike the ASCII
    * fold) and folds every other code-point run to one space, trimmed.
    *
    * ASCII inputs take a fast path straight into [[normalizeFold]] —
    * bit-equal by construction (UnicodeFoldSpec proves it on the corpus
    * and generated garbage), so a 100 TB mostly-ASCII corpus pays the
    * Normalizer only on rows that actually carry non-ASCII bytes; the
    * pre-scan is one char walk. Per-codepoint iteration (not per-char)
    * keeps astral symbols one separator wide. */
  def unicodeFold(text: UTF8String): UTF8String = {
    val raw = if (text == null) UTF8String.EMPTY_UTF8 else text
    // ASCII pre-scan over the UTF-8 BYTES (a non-ASCII code point always
    // carries a high bit), so the dominant clean-row path allocates no
    // intermediate String here — normalizeFold does its own single copy
    var ascii = true
    var k = 0
    val nb = raw.numBytes
    while (ascii && k < nb) {
      if (raw.getByte(k) < 0) ascii = false
      k += 1
    }
    if (ascii) return normalizeFold(raw)
    val s0 = raw.toString
    import java.text.Normalizer
    val lower = Normalizer.normalize(s0, Normalizer.Form.NFKC)
      .toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
    val n = nfd.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSep = false
    var started = false
    var i = 0
    while (i < n) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK) {
        () // diacritic: dropped, glued to its base — never a separator
      } else if (Character.isLetterOrDigit(cp)) {
        if (pendingSep && started) sb.append(' ')
        sb.appendCodePoint(Character.toLowerCase(cp))
        started = true
        pendingSep = false
      } else pendingSep = true
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Adjacent-token bigram pairs — codegen twin of the q88/q101 HOF
    * chain `transform(sequence(0, size(t)-2), i =>
    * struct(element_at(t, i+1) AS w1, element_at(t, i+2) AS w2))`,
    * which evaluated as an interpreted lambda tree (ArrayTransform/
    * Sequence are CodegenFallback) allocating a sequence array plus a
    * per-element interpreted struct build for every document. One
    * straight-line pass instead. Exact-twin notes: a null token
    * propagates to a null FIELD (element_at of a null element), the
    * struct itself is never null; callers guard `size(t) >= 2` (the
    * HOF's sequence(0, n-2) is ill-formed below that — this kernel
    * returns an empty array there, same as the guarded domain never
    * evaluating). */
  def bigramPairs(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev: UTF8String = if (toks.isNullAt(0)) null else toks.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      out(i - 1) = new GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sliding k-token spans joined by one space — codegen twin of the
    * q78 HOF chain `transform(sequence(0, size(t)-k), i =>
    * array_join(slice(t, i+1, k), " "))`. array_join SKIPS null
    * elements (no separator for them) exactly like
    * UTF8String.concatWs; split() output never contains nulls, so the
    * null path is defensive parity. Callers guard `size(t) >= k`
    * (empty array returned below, same as the guarded domain). */
  def spanJoin(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i < out.length) {
      var o = 0
      while (o < k) {
        window(o) = if (toks.isNullAt(i + o)) null else toks.getUTF8String(i + o)
        o += 1
      }
      out(i) = UTF8String.concatWs(SpaceSep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val SpaceSep = UTF8String.fromString(" ")

  /** Strided k-token chunks joined by one space — codegen twin of the
    * Curation16.chunk HOF `transform(sequence(0,
    * floor((size(w)-1)/k)), i => concat_ws(" ", slice(w, i*k+1, k)))`
    * (the derived line/paragraph segmentation). The tail chunk is
    * partial (slice past the end returns fewer elements); concat_ws
    * skips null tokens like the HOF. Degenerate n=0 input replicates
    * the HOF literally: sequence(0, -1) = [0, -1] yields two empty
    * joins — unreachable with split() output (always >= 1 element)
    * but pinned for exactness. */
  def chunkJoin(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8, UTF8String.EMPTY_UTF8))
    val m = (n - 1) / k + 1
    val out = new Array[Any](m)
    var c = 0
    while (c < m) {
      val start = c * k
      val w = math.min(k, n - start)
      val window = new Array[UTF8String](w)
      var o = 0
      while (o < w) {
        window(o) = if (toks.isNullAt(start + o)) null else toks.getUTF8String(start + o)
        o += 1
      }
      out(c) = UTF8String.concatWs(SpaceSep, window: _*)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Sparse BM25 postings — codegen twin of the Bm25 operator's HOF
    * chain `transform(array_intersect(qterms, toks), t =>
    * struct(t AS term, size(filter(toks, x => x === t)) AS tf))`:
    * for each query term PRESENT in the document (qterms order; qterms
    * is already sorted-distinct and null-free), emit (term, count of
    * equal tokens). The nested interpreted filter made the HOF
    * O(|matched| × |toks|) per row; this is one O(|toks| + |qterms|)
    * hash-count pass. Exact-twin notes: `x === t` is null for a null
    * token, which filter() drops — the kernel skips null tokens the
    * same way; string equality is binary (UTF8String.equals), the
    * same comparison === compiles to. */
  def postings(toks: ArrayData, qterms: ArrayData): ArrayData = {
    val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        counts.merge(toks.getUTF8String(i), java.lang.Long.valueOf(1L),
          (a: java.lang.Long, b: java.lang.Long) =>
            java.lang.Long.valueOf(a.longValue() + b.longValue()))
      }
      i += 1
    }
    val nq = qterms.numElements()
    val buf = new scala.collection.mutable.ArrayBuffer[Any](4)
    var q = 0
    while (q < nq) {
      val t = qterms.getUTF8String(q)
      val c = counts.get(t)
      if (c != null) buf += new GenericInternalRow(Array[Any](t, c.longValue()))
      q += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Per-term token counts aligned to a FIXED term list — codegen twin
    * of q118's per-term `size(filter(toks, x => x === lit(term)))`
    * columns (k interpreted ArrayFilter passes per row become one
    * O(|toks|·k) comparison pass with k tiny; null tokens compare
    * null and are dropped, exactly like ===). */
  def termFreqs(toks: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val out = new Array[Long](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        while (j < terms.length) {
          if (terms(j).equals(t)) out(j) += 1L
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing selection (Schleimer/Wilkerson/Aiken SIGMOD'03) over an
    * already-computed k-gram hash sequence: sliding window of `w`
    * hashes, keep the rightmost minimum of each window, dedupe
    * consecutive picks. Split from the hashing so the hash can be a
    * cross-engine one (QueryDsl.crossHash60) and the whole fingerprint
    * becomes oracle-checkable; the selection itself is pure integer
    * logic, identical in any engine. */
  def winnowSelect(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n <= w) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) { val h = hashes.getLong(i); if (h < m) m = h; i += 1 }
      return new GenericArrayData(Array(m))
    }
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var lastPick = -1
    var i = 0
    while (i + w <= n) {
      var minIdx = i
      var j = i + 1
      while (j < i + w) {
        if (hashes.getLong(j) <= hashes.getLong(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      if (minIdx != lastPick) { out += hashes.getLong(minIdx); lastPick = minIdx }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class LangIdExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))
  override def prettyName: String = "graft_langid"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.langId(a.asInstanceOf[UTF8String])
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.langId($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WinnowExpr(child: Expression, kGram: Int, window: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.winnow(a.asInstanceOf[UTF8String], kGram, window)
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.winnow($c, $kGram, $window)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WinnowSelectExpr(child: Expression, window: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_select"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.winnowSelect(a.asInstanceOf[ArrayData], window)
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.winnowSelect($c, $window)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class QualityGateExpr(child: Expression, minTok: Int, maxTok: Int,
    minTtr: Double, maxRep: Double) extends UnaryKernelExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_quality_gate"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.qualityGate(a.asInstanceOf[UTF8String], minTok, maxTok, minTtr, maxRep)
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.qualityGate($c, $minTok, $maxTok, $minTtr, $maxRep)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class NormalizeTextExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_norm_text"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.normalizeFold(a.asInstanceOf[UTF8String])
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.normalizeFold($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class UnicodeFoldExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_norm_unicode"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.unicodeFold(a.asInstanceOf[UTF8String])
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.unicodeFold($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PostingsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = true),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_postings"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.postings(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.TextKernels.postings($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** term_freqs(toks) → array<bigint> aligned to the fixed `terms` list
  * (constructor reference, not a child expression). */
case class TermFreqsExpr(child: Expression, terms: Array[UTF8String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_term_freqs"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.termFreqs(a.asInstanceOf[ArrayData], terms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bmTerms", terms,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.TextKernels.termFreqs($c, $tRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class BigramPairsExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = true),
    StructField("w2", StringType, nullable = true))), containsNull = false)
  override def prettyName: String = "graft_bigram_pairs"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.bigramPairs(a.asInstanceOf[ArrayData])
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.bigramPairs($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SpanJoinExpr(child: Expression, k: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_span_join"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.spanJoin(a.asInstanceOf[ArrayData], k)
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.spanJoin($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ChunkJoinExpr(child: Expression, k: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chunk_join"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.chunkJoin(a.asInstanceOf[ArrayData], k)
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.chunkJoin($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  def normText(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(text)))
  def normUnicode(text: Column): Column =
    ColumnBridge.column(UnicodeFoldExpr(ColumnBridge.expression(text)))
  def langId(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
  def qualityGate(text: Column, minTok: Int, maxTok: Int,
      minTtr: Double, maxRep: Double): Column =
    ColumnBridge.column(QualityGateExpr(ColumnBridge.expression(text),
      minTok, maxTok, minTtr, maxRep))
  def winnow(text: Column, kGram: Int, window: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), kGram, window))
  def winnowSelect(hashes: Column, window: Int): Column =
    ColumnBridge.column(WinnowSelectExpr(ColumnBridge.expression(hashes), window))
  def bigramPairs(toks: Column): Column =
    ColumnBridge.column(BigramPairsExpr(ColumnBridge.expression(toks)))
  def spanJoin(toks: Column, k: Int): Column =
    ColumnBridge.column(SpanJoinExpr(ColumnBridge.expression(toks), k))
  def chunkJoin(toks: Column, k: Int): Column =
    ColumnBridge.column(ChunkJoinExpr(ColumnBridge.expression(toks), k))
  def postings(toks: Column, qterms: Column): Column =
    ColumnBridge.column(PostingsExpr(
      ColumnBridge.expression(toks), ColumnBridge.expression(qterms)))
  def termFreqs(toks: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermFreqsExpr(ColumnBridge.expression(toks),
      terms.map(UTF8String.fromString).toArray))
}
