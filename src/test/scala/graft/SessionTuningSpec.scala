package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the byte-budget derivation of the ObjectHashAggregate fallback
  * threshold (r18 VERDICT finding 6: the constant bounded entries, not
  * bytes — the derivation must make entries x maxKeyBytes <= budget the
  * visible invariant, keep the stock default numerically identical, and
  * scale DOWN for long-key deployments).
  */
class SessionTuningSpec extends AnyFunSuite {

  test("default budget derives the shipped 262144 (bench numbers unchanged)") {
    assert(SessionTuning.objectHashFallbackEntries(256L << 20, 1024L) === 262144L)
    // the env-reading overload with no overrides in this process must agree
    if (!sys.env.contains("SPARK_GRAFT_AGG_TASK_BYTES") &&
        !sys.env.contains("SPARK_GRAFT_AGG_MAX_KEY_BYTES"))
      assert(SessionTuning.objectHashFallbackEntries === 262144L)
  }

  test("long-key deployments scale the threshold down, budget preserved") {
    // 16 KiB documents as group keys: 256 MiB / 16 KiB = 16384 entries
    val e = SessionTuning.objectHashFallbackEntries(256L << 20, 16L << 10)
    assert(e === 16384L)
    assert(e * (16L << 10) <= (256L << 20)) // the invariant itself
  }

  test("never derives below Spark's stock 128, never divides by zero") {
    assert(SessionTuning.objectHashFallbackEntries(1L << 10, 1L << 20) === 128L)
    assert(SessionTuning.objectHashFallbackEntries(256L << 20, 0L) === (256L << 20))
  }
}
