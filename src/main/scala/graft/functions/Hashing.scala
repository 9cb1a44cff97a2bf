package graft.functions

/** Deterministic 64-bit hashing used by the dedup/fingerprint operators.
  *
  * FNV-1a 64 over UTF-8 bytes, finished with a splitmix64 avalanche; the
  * k-th "independent" hash family member is derived by mixing in an odd
  * seed constant (standard tabulation-style derivation, see Broder's
  * minwise-hashing construction). Pure, allocation-free, stable across
  * JVMs — results are part of the engine's persisted fingerprints, so
  * this must never change.
  */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — full avalanche of the 64-bit state. */
  def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** k-th hash-family member applied to a string. */
  def seeded(s: String, k: Int): Long = mix64(fnv1a64(s) ^ (0x9e3779b97f4a7c15L * (k + 1)))

  def hash64(s: String): Long = mix64(fnv1a64(s))
}
