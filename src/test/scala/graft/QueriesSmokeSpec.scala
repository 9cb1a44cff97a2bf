package graft

/** Every registered query runs at sf0.001 and returns rows with the
  * declared schema. The value-level gate is the DuckDB oracle compare
  * (tools/validate_oracle.py) run by the driver at sf0.01. */
class QueriesSmokeSpec extends SparkSpecBase {
  // Queries whose empty result is a legitimate answer at the smoke SF
  // (q103: "no training doc shares an 8-gram with the benchmark" —
  // true of the sf0.001 corpus; oracle-checked non-empty at sf0.01+).
  private val mayBeEmpty = Set("q103_decontamination")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(q.name))
        assert(df.count() > 0, s"${q.name} returned no rows at $sfDir")
      else df.count() // still must execute
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
