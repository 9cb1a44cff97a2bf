package graft.functions

import org.apache.spark.sql.Column

/** MinHash / SimHash primitives for near-duplicate detection.
  *
  * MinHash: Broder, "On the resemblance and containment of documents"
  * (1997) — k independent min-hashes of the shingle set estimate Jaccard;
  * banding (Leskovec/Rajaraman/Ullman, MMDS ch.3) turns signatures into
  * an LSH bucket join so candidate generation is a shuffle on
  * (band, bandHash), never an O(n²) cross join.
  *
  * SimHash: Charikar, "Similarity estimation techniques from rounding
  * algorithms" (STOC 2002); 64-bit fingerprints, near-dups = small
  * Hamming distance, blocked by splitting the fingerprint into bands
  * (pigeonhole: hamming <= bands-1 ⇒ some band matches exactly).
  *
  * Every Column entry point delegates to the native codegen kernels in
  * [[graft.functions.expr.DedupExpressions]] — there is exactly one
  * public path and it is the fast one. The plain-Scala `*Impl`
  * functions below are the independent reference implementations the
  * parity spec (DedupExprParitySpec) checks the kernels against; they
  * are NOT wrapped in `udf()` here (the spec wraps them locally).
  */
object DedupFunctions {

  /** k min-hashes over a token/shingle sequence. Reference impl. */
  def minHashSigImpl(shingles: Seq[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (shingles == null) return sig
    shingles.foreach { s =>
      val base = Hashing.fnv1a64(s)
      var i = 0
      while (i < k) {
        val h = Hashing.mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** k min-hashes over a string shingle array (native kernel). */
  def minHashSig(shingles: Column, k: Int): Column =
    expr.DedupExpressions.minHashSigStr(shingles, k)

  /** k min-hashes over an already-hashed (long) shingle set — the hot
    * path: elements were hashed once per document upstream, so each
    * family member is a single mix64 per element. Reference impl. */
  def minHashSigLongImpl(hashed: Seq[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (hashed == null) return sig
    hashed.foreach { base =>
      var i = 0
      while (i < k) {
        val h = Hashing.mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  def minHashSigLong(hashedShingles: Column, k: Int): Column =
    expr.DedupExpressions.minHashSig(hashedShingles, k)

  /** Hash each signature band to a single bucket key. Reference impl. */
  def bandHashesImpl(sig: Seq[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = Hashing.FnvOffset
      var i = b * rows
      while (i < (b + 1) * rows) {
        h ^= sig(i); h *= Hashing.FnvPrime
        i += 1
      }
      Hashing.mix64(h ^ b.toLong)
    }
  }

  def bandHashes(sig: Column, bands: Int): Column =
    expr.DedupExpressions.bandHashes(sig, bands)

  /** 64-bit SimHash of a token sequence (token-frequency weighted).
    * Reference impl. */
  def simHash64Impl(tokens: Seq[String]): Long = {
    if (tokens == null || tokens.isEmpty) return 0L
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = Hashing.hash64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  def simHash64(tokens: Column): Column =
    expr.DedupExpressions.simHash64(tokens)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))

  /** Split a 64-bit fingerprint into `bands` equal bit-chunks.
    * Reference impl. */
  def fpBandsImpl(fp: Long, bands: Int): Array[Long] = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    Array.tabulate(bands)(b => (fp >>> (b * width)) & mask)
  }

  def fpBands(fp: Column, bands: Int): Column =
    expr.DedupExpressions.fpBands(fp, bands, 64 / bands)
}
