package graft.functions.expr

import graft.functions.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** ArrayData-native kernels for the LSH constructions — replace the
  * Scala-UDF formulations (which box every element through
  * UTF8String→String→Seq conversions per row) with single-pass loops
  * over the unsafe array format, invoked from generated code.
  */
object DedupKernels {

  /** k min-hashes over an already-hashed (long) shingle set. */
  def minHashSig(hashed: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashed.numElements()
    var e = 0
    while (e < n) {
      val base = hashed.getLong(e)
      var i = 0
      while (i < k) {
        val h = Hashing.mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  /** k min-hashes over raw string shingles: each element is FNV-1a
    * hashed once, then the mix64 family per member — same family (and
    * same results) as [[minHashSig]] fed pre-hashed longs. */
  def minHashSigStr(shingles: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var e = 0
    while (e < n) {
      val base = fnv1a64Utf8(shingles.getUTF8String(e))
      var i = 0
      while (i < k) {
        val h = Hashing.mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  /** LSH band bucket hashes over a minhash signature. */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val rows = sig.numElements() / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Hashing.FnvOffset
      var i = b * rows
      while (i < (b + 1) * rows) {
        h ^= sig.getLong(i); h *= Hashing.FnvPrime
        i += 1
      }
      out(b) = Hashing.mix64(h ^ b.toLong)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array (frequency-weighted). */
  def simHash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val acc = new Array[Int](64)
    var e = 0
    while (e < n) {
      val t = tokens.getUTF8String(e)
      val h = Hashing.mix64(fnv1a64Utf8(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      e += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature via universal mod-P permutations over an
    * already-hashed shingle array — arithmetic exactly matches the
    * q29 DuckDB oracle's SQL formulation (aᵢ·(h mod P) + bᵢ mod P,
    * P = 2³¹−1, all products < 2⁶²), hoisted out of an interpreted
    * higher-order transform into a codegen kernel (~10× on the 10×
    * stress corpus). */
  def minHashSigMod(hashed: ArrayData, k: Int): ArrayData = {
    val P = 2147483647L
    val n = hashed.numElements()
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = i.toLong * 40503L + 11L
      val b = (i.toLong * 2654435761L) % P
      var m = Long.MaxValue
      var e = 0
      while (e < n) {
        val v = (a * (hashed.getLong(e) % P) + b) % P
        if (v < m) m = v
        e += 1
      }
      sig(i) = m
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash over an ALREADY-HASHED token array (frequency-weighted
    * bit votes on the low `bits` bits). Split from the hashing so the
    * hash can be the cross-engine QueryDsl.crossHash60 — making the
    * whole fingerprint mirrorable in a DuckDB oracle — while the vote
    * loop stays a native kernel. */
  def simHashFromHashes(hashes: ArrayData, bits: Int): Long = {
    val n = hashes.numElements()
    if (n == 0) return 0L
    val acc = new Array[Int](bits)
    var e = 0
    while (e < n) {
      val h = hashes.getLong(e)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      e += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (acc(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** FNV-1a over UTF8String bytes without materializing a String —
    * byte-identical to Hashing.fnv1a64(s.toString) for valid UTF-8. */
  private def fnv1a64Utf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = Hashing.FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Hashing.FnvPrime
      i += 1
    }
    h
  }

  /** Random-hyperplane signature (deterministic ±1 planes from mix64). */
  def hyperplaneSig(v: ArrayData, bits: Int): Long = {
    var sig = 0L
    val n = v.numElements()
    var i = 0
    while (i < bits) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val sign = if ((Hashing.mix64((i.toLong << 32) ^ j.toLong) & 1L) == 1L) 1.0 else -1.0
        acc += v.getDouble(j) * sign
        j += 1
      }
      if (acc > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Rademacher-hyperplane signature over an integer parity mix —
    * arithmetic and summation order exactly match the SQL/DuckDB
    * formulation (sign(i,j) = +1 iff (i·1315423911 + j·2654435761)
    * mod 1000003 is odd; dot accumulated in ascending j), so the
    * kernel's bits are bit-identical to the q32 oracle's while running
    * inside codegen instead of an interpreted higher-order aggregate. */
  def rademacherSig(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var i = 0
    while (i < bits) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val mix = (i.toLong * 1315423911L + j.toLong * 2654435761L) % 1000003L
        val x = v.getDouble(j)
        acc += (if ((mix & 1L) == 1L) x else -x)
        j += 1
      }
      if (acc > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  private def xx64(s: org.apache.spark.unsafe.types.UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** QueryDsl.crossHash60 over raw UTF8String bytes — the top 60 bits
    * of md5, exactly the Column form's conv(substr(md5, 1, 15), 16, 10)
    * (md5() hashes the string's UTF-8 bytes; hashing them directly
    * avoids the toString round-trip). */
  private[expr] def crossHash60Utf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Sorted-distinct xxhash64 k-shingles of a token array — codegen
    * twin of the Dedup.docShingled / ngramPairs HOF chain
    * `array_sort(array_distinct(when(size(toks) >= k,
    *   transform(sequence(0, n−k), i => xxhash64(concat_ws(" ", toks[i+1..i+k]))))
    *  .otherwise(transform(toks, xxhash64))))`,
    * which evaluated as an interpreted lambda tree per document
    * (ArrayTransform/Sequence are CodegenFallback — profiled as the
    * dedup family's dominant scan-stage CPU). Exact-twin notes: hashes
    * are Spark's xxhash64 (XXH64 over UTF-8 bytes, seed 42) of the
    * concat_ws join — concat_ws SKIPS null tokens, so a null inside a
    * k-window hashes the joined survivors, and in the <k per-token
    * branch xxhash64 IGNORES a null input and returns its seed (42L) —
    * hash expressions never produce null, so neither does this kernel.
    * split() never produces null tokens, so the null paths are
    * defensive parity, not data. */
  def xxShinglesK(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val hs: Array[Long] =
      if (n >= k) {
        val out = new Array[Long](n - k + 1)
        val window = new Array[org.apache.spark.unsafe.types.UTF8String](k)
        var i = 0
        while (i < out.length) {
          var o = 0
          while (o < k) {
            window(o) = if (toks.isNullAt(i + o)) null else toks.getUTF8String(i + o)
            o += 1
          }
          out(i) = xx64(org.apache.spark.unsafe.types.UTF8String.concatWs(Space, window: _*))
          i += 1
        }
        out
      } else {
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          out(i) = if (toks.isNullAt(i)) 42L else xx64(toks.getUTF8String(i))
          i += 1
        }
        out
      }
    java.util.Arrays.sort(hs)
    var m = 0
    var i = 0
    while (i < hs.length) {
      if (m == 0 || hs(i) != hs(m - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    val uniq = if (m == hs.length) hs else java.util.Arrays.copyOf(hs, m)
    UnsafeArrayData.fromPrimitiveArray(uniq)
  }

  /** crossHash60 of the DISTINCT k-token shingles (or distinct tokens
    * when the doc is shorter than k), optionally sorted — codegen twin
    * of `transform(Dedup.shinglesK(toks, k), sh => crossHash60(sh))`
    * (+ array_sort for the minhash path). Distinctness is on the
    * shingle STRINGS (first-occurrence order, like array_distinct);
    * hash-collision duplicates survive, exactly as the HOF chain's.
    * Null tokens: concat_ws skips them inside a window; in the <k
    * branch a null token is kept once by array_distinct and hashes to
    * a null element in place. */
  def crossShinglesK(toks: ArrayData, k: Int, sorted: Boolean): ArrayData = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var sawNull = false
    var nullPos = -1
    var cnt = 0
    val buf = new scala.collection.mutable.ArrayBuilder.ofLong
    if (n >= k) {
      val window = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var i = 0
      while (i <= n - k) {
        var o = 0
        while (o < k) {
          window(o) = if (toks.isNullAt(i + o)) null else toks.getUTF8String(i + o)
          o += 1
        }
        val sh = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, window: _*)
        if (seen.add(sh)) { buf += crossHash60Utf8(sh); cnt += 1 }
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        if (toks.isNullAt(i)) {
          if (!sawNull) { sawNull = true; nullPos = cnt }
        } else {
          val t = toks.getUTF8String(i)
          if (seen.add(t)) { buf += crossHash60Utf8(t); cnt += 1 }
        }
        i += 1
      }
    }
    val hs = buf.result()
    if (sorted) java.util.Arrays.sort(hs)
    if (!sawNull) UnsafeArrayData.fromPrimitiveArray(hs)
    else {
      // distinct keeps the null at its first-occurrence position;
      // array_sort (sorted=true) moves it last
      val boxed = new Array[Any](hs.length + 1)
      val at = if (sorted) hs.length else nullPos
      var j = 0
      var src = 0
      while (j < boxed.length) {
        if (j == at) boxed(j) = null
        else { boxed(j) = hs(src); src += 1 }
        j += 1
      }
      new GenericArrayData(boxed)
    }
  }

  /** crossHash60 of EVERY k-gram in position order (no distinct) —
    * codegen twin of `transform(sequence(0, n−k), i =>
    * crossHash60(concat_ws(" ", slice(toks, i+1, k))))` (q183's
    * per-position L-gram pass). Caller guards n ≥ k (the HOF sits
    * under a `when(size >= L, …).otherwise(array())`). */
  def crossGramsK(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](n - k + 1)
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](k)
    var i = 0
    while (i < out.length) {
      var o = 0
      while (o < k) {
        window(o) = if (toks.isNullAt(i + o)) null else toks.getUTF8String(i + o)
        o += 1
      }
      out(i) = crossHash60Utf8(
        org.apache.spark.unsafe.types.UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Scalar [[crossHash60Utf8]] exposed for generated code (the
    * CrossHash60Expr call target). */
  def crossHash60One(s: org.apache.spark.unsafe.types.UTF8String): Long =
    crossHash60Utf8(s)

  /** crossHash60 of every element in order — codegen twin of
    * `transform(arr, w => crossHash60(w))` (q30's per-token hash feed
    * into the simhash vote kernel). Null elements hash to null. */
  def crossHash60All(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var sawNull = false
    var i = 0
    while (i < n && !sawNull) { sawNull = arr.isNullAt(i); i += 1 }
    if (!sawNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) { out(i) = crossHash60Utf8(arr.getUTF8String(i)); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val boxed = new Array[Any](n)
      i = 0
      while (i < n) {
        boxed(i) = if (arr.isNullAt(i)) null else crossHash60Utf8(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(boxed)
    }
  }

  /** PPJoin df-ordered prefix without per-doc window state: `entries`
    * is one document's (df, sh) pairs in ANY order (sh distinct within
    * a doc, so (df, sh) is a strict total order); returns the sh of the
    * first `n - ceil(t·n) + 1` entries under (df ASC, sh ASC) — element
    * i is exactly the row `row_number() OVER (PARTITION BY doc ORDER BY
    * df, sh) = i+1` that the window formulation kept, so
    * `posexplode(...)` with `pos + 1` reproduces (sh, rk) bit-for-bit.
    * Replaces the Exchange+Sort+Window over the full exploded shingle
    * stream with a hash aggregate + per-doc O(s log s) sort, and prunes
    * the (1-t)-tail BEFORE rows are emitted/persisted. */
  def prefixByDf(entries: ArrayData, threshold: Double): ArrayData = {
    val n = entries.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val dfs = new Array[Long](n)
    val shs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = entries.getStruct(i, 2)
      dfs(i) = r.getLong(0); shs(i) = r.getLong(1); i += 1
    }
    sortPairs(dfs, shs, 0, n - 1)
    // same arithmetic as the window filter: rk <= sz - ceil(t*sz) + 1
    val p0 = n.toLong - math.ceil(threshold * n).toLong + 1L
    val p = if (p0 < 0L) 0 else if (p0 > n) n else p0.toInt
    val out = new Array[Long](p)
    System.arraycopy(shs, 0, out, 0, p)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** In-place quicksort of parallel (df, sh) arrays by (df ASC, sh ASC);
    * insertion sort below 16 elements. */
  private def sortPairs(dfs: Array[Long], shs: Array[Long], lo: Int, hi: Int): Unit = {
    @inline def less(d1: Long, s1: Long, d2: Long, s2: Long): Boolean =
      d1 < d2 || (d1 == d2 && s1 < s2)
    if (hi - lo < 16) {
      var i = lo + 1
      while (i <= hi) {
        val d = dfs(i); val s = shs(i)
        var j = i - 1
        while (j >= lo && less(d, s, dfs(j), shs(j))) {
          dfs(j + 1) = dfs(j); shs(j + 1) = shs(j); j -= 1
        }
        dfs(j + 1) = d; shs(j + 1) = s
        i += 1
      }
    } else {
      val mid = lo + (hi - lo) / 2
      val pd = dfs(mid); val ps = shs(mid)
      var i = lo; var j = hi
      while (i <= j) {
        while (less(dfs(i), shs(i), pd, ps)) i += 1
        while (less(pd, ps, dfs(j), shs(j))) j -= 1
        if (i <= j) {
          val td = dfs(i); dfs(i) = dfs(j); dfs(j) = td
          val ts = shs(i); shs(i) = shs(j); shs(j) = ts
          i += 1; j -= 1
        }
      }
      if (lo < j) sortPairs(dfs, shs, lo, j)
      if (i < hi) sortPairs(dfs, shs, i, hi)
    }
  }

  /** Content-defined chunks of a token array (q113): a token whose
    * crossHash60 is ≡ 0 (mod `m`) CLOSES its chunk; each chunk is its
    * tokens joined by ' ' in position order, emitted in chunk order.
    * Exact twin of the posexplode → per-doc prefix-count window
    * (`sum(bnd) rows unbounded preceding to 1 preceding`) →
    * groupBy(doc, chunk_idx) collect_list/array_sort/array_join chain
    * it replaces: a token's chunk index there counts boundaries at
    * strictly earlier positions, i.e. chunks are maximal runs ending
    * at a boundary token, trailing boundary-less run kept. Null
    * elements are skipped exactly like array_join skips them (no
    * separator) and never close a chunk (the window twin's
    * `when(pmod(h, m) === 0, 1)` is null there ⇒ otherwise-0). */
  def cdcChunks(tokens: ArrayData, m: Int): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[Any](8)
    val sb = new java.lang.StringBuilder
    var open = false
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i)
        if (open) sb.append(' ')
        sb.append(w.toString)
        open = true
        if (crossHash60One(w) % m == 0L) {
          out.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
          sb.setLength(0); open = false
        }
      }
      i += 1
    }
    if (open) out.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }

  /** Split a `bands*width`-bit fingerprint into `bands` bit-chunks. */
  def fpBands(fp: Long, bands: Int, width: Int): ArrayData = {
    val mask = if (width == 64) -1L else (1L << width) - 1
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) { out(b) = (fp >>> (b * width)) & mask; b += 1 }
    new GenericArrayData(out)
  }

  /** C(n,2) ordered pair structs of a long-id array: (ids[i], ids[j])
    * for every i < j, emitted in (i, j) order — the in-row intra-group
    * pair expansion (r19: exact twin of the nested
    * `flatten(transform(sequence(1, n-1), i -> transform(slice(ids,
    * i+1, n-i), x -> struct(element_at(ids, i), x))))` interpreted
    * lambda tree, which evaluated FOUR stacked HOFs per row). Null
    * elements carry through as null struct fields; n < 2 yields an
    * empty array (the call site filters to n ≥ 2, where the HOF twin
    * agrees — its n ≤ 1 degenerate shape is a negative-step `sequence`
    * artifact no caller may rely on). */
  def pairStructs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val vals = new Array[Any](n)
    var v = 0
    while (v < n) {
      vals(v) = if (ids.isNullAt(v)) null else java.lang.Long.valueOf(ids.getLong(v))
      v += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n - 1) {
      val a = vals(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a, vals(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

abstract class UnaryKernelExpression extends UnaryExpression {
  /** Generated-code call; `c` is the child variable. */
  protected def genCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, genCall)
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.minHashSig(a.asInstanceOf[ArrayData], k)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.minHashSig($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSigStrExpr(child: Expression, k: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_str"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.minHashSigStr(a.asInstanceOf[ArrayData], k)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.minHashSigStr($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class BandHashesExpr(child: Expression, bands: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bands"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.bandHashes(a.asInstanceOf[ArrayData], bands)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.bandHashes($c, $bands)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash64Expr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.simHash64(a.asInstanceOf[ArrayData])
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.simHash64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSigModExpr(child: Expression, k: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_mod"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.minHashSigMod(a.asInstanceOf[ArrayData], k)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.minHashSigMod($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHashFromHashesExpr(child: Expression, bits: Int) extends UnaryKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_from_hashes"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.simHashFromHashes(a.asInstanceOf[ArrayData], bits)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.simHashFromHashes($c, $bits)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class RademacherSigExpr(child: Expression, bits: Int) extends UnaryKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rademacher_sig"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.rademacherSig(a.asInstanceOf[ArrayData], bits)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.rademacherSig($c, $bits)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class HyperplaneSigExpr(child: Expression, bits: Int) extends UnaryKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.hyperplaneSig(a.asInstanceOf[ArrayData], bits)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.hyperplaneSig($c, $bits)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class XxShinglesKExpr(child: Expression, k: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_xx_shingles"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.xxShinglesK(a.asInstanceOf[ArrayData], k)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.xxShinglesK($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CrossShinglesKExpr(child: Expression, k: Int, sorted: Boolean)
    extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_cross_shingles"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.crossShinglesK(a.asInstanceOf[ArrayData], k, sorted)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.crossShinglesK($c, $k, $sorted)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CrossGramsKExpr(child: Expression, k: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cross_grams"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.crossGramsK(a.asInstanceOf[ArrayData], k)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.crossGramsK($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Scalar QueryDsl.crossHash60 — md5 digest bits assembled directly,
  * skipping the Column form's hex-encode + substring + conv string
  * parse per call (the dominant per-token cost of q111's bucket hash;
  * GraftExtensionsSpec pins kernel == SQL == Jvm). The child must
  * already be cast to string (the QueryDsl helper does). */
case class CrossHash60Expr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cross_hash60"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.crossHash60One(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.crossHash60One($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CrossHash60AllExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_cross_hash_all"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.crossHash60All(a.asInstanceOf[ArrayData])
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.crossHash60All($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** df-ordered PPJoin prefix over one doc's collected (df, sh) pairs —
  * see [[DedupKernels.prefixByDf]]. The threshold rides into generated
  * code as a double literal. */
case class PrefixByDfExpr(child: Expression, threshold: Double) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_prefix_by_df"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.prefixByDf(a.asInstanceOf[ArrayData], threshold)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.prefixByDf($c, ${threshold}D)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PairStructsExpr(child: Expression) extends UnaryKernelExpression {
  // field nullability mirrors the HOF twin: both fields carry raw array
  // elements, so they are nullable exactly when the input array's
  // elements are
  override def dataType: DataType = {
    val elNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a_id", LongType, nullable = elNull),
      org.apache.spark.sql.types.StructField("b_id", LongType, nullable = elNull))),
      containsNull = false)
  }
  override def prettyName: String = "graft_pair_structs"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.pairStructs(a.asInstanceOf[ArrayData])
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.pairStructs($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined chunking of a token array — see
  * [[DedupKernels.cdcChunks]]. */
case class CdcChunksExpr(child: Expression, m: Int) extends UnaryKernelExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.cdcChunks(a.asInstanceOf[ArrayData], m)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.cdcChunks($c, $m)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FpBandsExpr(child: Expression, bands: Int, width: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_fp_bands"
  override protected def nullSafeEval(a: Any): Any =
    DedupKernels.fpBands(a.asInstanceOf[Long], bands, width)
  protected def genCall(c: String): String =
    s"graft.functions.expr.DedupKernels.fpBands($c, $bands, $width)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object DedupExpressions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def minHashSig(hashedShingles: Column, k: Int): Column = c(MinHashSigExpr(e(hashedShingles), k))
  def minHashSigStr(shingles: Column, k: Int): Column = c(MinHashSigStrExpr(e(shingles), k))
  def bandHashes(sig: Column, bands: Int): Column = c(BandHashesExpr(e(sig), bands))
  def simHash64(tokens: Column): Column = c(SimHash64Expr(e(tokens)))
  def simHashFromHashes(hashes: Column, bits: Int): Column = c(SimHashFromHashesExpr(e(hashes), bits))
  def rademacherSig(v: Column, bits: Int): Column = c(RademacherSigExpr(e(v), bits))
  def minHashSigMod(hashedShingles: Column, k: Int): Column = c(MinHashSigModExpr(e(hashedShingles), k))
  def hyperplaneSig(v: Column, bits: Int): Column = c(HyperplaneSigExpr(e(v), bits))
  /** width = total signature bits / bands (16 for 64-bit simhash in 4
    * bands; 4 for 16-bit hyperplane signatures in 4 bands). */
  def fpBands(fp: Column, bands: Int, width: Int): Column = c(FpBandsExpr(e(fp), bands, width))
  def xxShinglesK(toks: Column, k: Int): Column = c(XxShinglesKExpr(e(toks), k))
  def crossShinglesK(toks: Column, k: Int, sorted: Boolean): Column =
    c(CrossShinglesKExpr(e(toks), k, sorted))
  def crossGramsK(toks: Column, k: Int): Column = c(CrossGramsKExpr(e(toks), k))
  def crossHash60All(arr: Column): Column = c(CrossHash60AllExpr(e(arr)))
  def crossHash60One(s: Column): Column = c(CrossHash60Expr(e(s)))
  def prefixByDf(entries: Column, threshold: Double): Column =
    c(PrefixByDfExpr(e(entries), threshold))
  def pairStructs(ids: Column): Column = c(PairStructsExpr(e(ids)))
  def cdcChunks(toks: Column, m: Int): Column = c(CdcChunksExpr(e(toks), m))
}
