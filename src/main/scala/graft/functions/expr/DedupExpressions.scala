package graft.functions.expr

import graft.functions.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

  /** Split a `bands*width`-bit fingerprint into `bands` bit-chunks. */
  def fpBands(fp: Long, bands: Int, width: Int): ArrayData = {
    val mask = if (width == 64) -1L else (1L << width) - 1
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) { out(b) = (fp >>> (b * width)) & mask; b += 1 }
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
}
