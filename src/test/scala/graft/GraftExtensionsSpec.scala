package graft

import org.apache.spark.sql.functions._

/** The native kernels through the SQL front-end. */
class GraftExtensionsSpec extends SparkSpecBase {

  test("crossHash60: JVM kernel twin is bit-identical to the Column form") {
    // the q188 fused kernel rides the JVM twin; a divergence here would
    // silently desync every typed kernel from the SQL/oracle hashes
    import spark.implicits._
    val samples = Seq("", " ", "a", "the quick brown fox", "tok1 tok2 tok3",
      "Ünïcødé ∂ north 北京", "trailing space ", "a b c d e f g h i j")
    val viaColumn = samples.toDF("s")
      .select(QueryDsl.crossHash60(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val viaJvm = samples.map(QueryDsl.crossHash60Jvm)
    assert(viaJvm == viaColumn)
    assert(viaJvm.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("registered functions evaluate from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS cos,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  graft_jaccard(array('a', 'b'), array('b', 'c')) AS jac,
        |  graft_simhash(array('x', 'y', 'x')) AS sh,
        |  graft_minhash(array(1L, 2L, 3L), 8) AS mh,
        |  graft_minhash_str(array('a b c d', 'b c d e'), 8) AS mhs,
        |  graft_fp_bands(255L, 4, 16) AS bands""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)  // parallel vectors
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 1.0 / 3.0)
    assert(r.getLong(3) == graft.functions.DedupFunctions.simHash64Impl(Seq("x", "y", "x")))
    assert(r.getSeq[Long](4).length == 8)
    assert(r.getSeq[Long](5).toSeq ==
      graft.functions.DedupFunctions.minHashSigImpl(Seq("a b c d", "b c d e"), 8).toSeq)
    assert(r.getSeq[Long](6) == Seq(255L, 0L, 0L, 0L))
  }

  test("graft_norm_text evaluates from SQL and matches the regex chain") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_norm_text('  THE Quick  brown-FOX!! 123 ') AS n,
        |  graft_norm_text('') AS empty, graft_norm_text(NULL) AS nul""".stripMargin).head()
    assert(r.getString(0) == "the quick brown fox 123")
    assert(r.getString(1) == "")
    assert(r.isNullAt(2))
  }

  test("graft_norm_unicode evaluates from SQL: NFKC + case fold + diacritic strip") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_norm_unicode('CafÉ  ﬁNANCE!') AS n,
        |  graft_norm_unicode('ascii only 7') AS a, graft_norm_unicode(NULL) AS nul""".stripMargin).head()
    assert(r.getString(0) == "cafe finance")
    assert(r.getString(1) == "ascii only 7")
    assert(r.isNullAt(2))
  }

  test("graft_quality_gate evaluates from SQL with numeric literals") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_quality_gate('one two three four five six', 3, 90, 0.34, 0.5) AS keep,
        |  graft_quality_gate('a a a a a a a a a a', 3, 90, 0.34, 0.09) AS drop_rep,
        |  graft_quality_gate('short', 3, 90, 0.34, 0.5) AS drop_len""".stripMargin).head()
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false) // one distinct token, repetitive
    assert(r.getBoolean(2) === false) // below min token count
  }

  test("SQL queries over registered views use the kernels end-to-end") {
    GraftFunctions.register(spark)
    Tables(spark, sfDir).embeddings.createOrReplaceTempView("emb")
    val top = spark.sql(
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       graft_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                    CAST(b.embedding AS ARRAY<DOUBLE>)) AS cos
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC LIMIT 5""".stripMargin).collect()
    assert(top.length == 5)
    assert(top.forall(r => r.getDouble(2) > 0.3)) // clustered embeddings
  }

  test("non-literal parameter to a literal-only arg is rejected") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1L), CAST(id AS INT)) FROM range(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("ISO-8601 duration codec round-trips envelope payloads") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_iso_duration_us('P1DT2H3M4.5S') AS us,
        |  graft_iso_duration(graft_iso_duration_us('PT2H30M')) AS rt,
        |  graft_iso_duration_us(graft_iso_duration(93784500000L)) AS us2,
        |  graft_intersect_count(array(1L,3L,5L,9L), array(3L,4L,5L)) AS inter""".stripMargin).head()
    assert(r.getLong(0) == ((26 * 3600L + 3 * 60L + 4) * 1000000L + 500000L))
    assert(r.getString(1) == "PT2H30M")
    assert(r.getLong(2) == 93784500000L)  // format(parse(x)) is lossless
    assert(r.getLong(3) == 2L)
  }

  test("jaro-winkler kernel matches the published fixture values") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT round(graft_jaro_winkler('martha', 'marhta'), 10),
        |  round(graft_jaro_winkler('dixon', 'dicksonx'), 10),
        |  round(graft_jaro_winkler('duane', 'dwayne'), 10),
        |  graft_jaro_winkler('kitten', 'sitting'),
        |  graft_jaro_winkler('abc', 'abc'),
        |  graft_jaro_winkler('', 'abc'),
        |  graft_jaro_winkler('ab', 'ba')""".stripMargin).head()
    assert(r.getDouble(0) == 0.9611111111)  // boost: l=3
    assert(r.getDouble(1) == 0.8133333333)  // boost: l=2
    assert(r.getDouble(2) == 0.84)          // boost: l=1
    assert(math.abs(r.getDouble(3) - 0.746031746031746) < 1e-15)  // no common prefix
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 0.0)           // empty edge matches DuckDB
    assert(r.getDouble(6) == 0.0)           // zero match window
  }
}
