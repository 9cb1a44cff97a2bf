package graft

/** Every registered query runs at sf0.001 and returns rows with the
  * declared schema. The value-level gate is the DuckDB oracle compare
  * (tools/validate_oracle.py) run by the driver at sf0.01. */
class QueriesSmokeSpec extends SparkSpecBase {
  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned no rows at $sfDir")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
