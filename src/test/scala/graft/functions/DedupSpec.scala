package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Correctness of the no-oracle dedup primitives: MinHash estimates
  * Jaccard, LSH banding recalls true near-dups, SimHash tracks edit
  * similarity. */
class DedupSpec extends SparkSpecBase {

  private def shingleSet(tokens: Seq[String]): Set[String] =
    tokens.sliding(2).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size.toDouble

  val base = "the quick brown fox jumps over the lazy dog while rain falls on green hills near the old stone bridge".split(" ").toSeq
  val nearDup = base.updated(4, "leaps") // one token changed
  val unrelated = "completely different words about spark engines shuffling data across many executor nodes tonight".split(" ").toSeq

  test("minhash signature similarity estimates jaccard") {
    val k = 256 // more hashes -> tighter estimate for the assertion
    def sig(t: Seq[String]) = DedupFunctions.minHashSigImpl(shingleSet(t).toSeq, k)
    val (sa, sb, sc) = (sig(base), sig(nearDup), sig(unrelated))
    def est(x: Array[Long], y: Array[Long]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / k
    val trueJ = jaccard(shingleSet(base), shingleSet(nearDup))
    assert(math.abs(est(sa, sb) - trueJ) < 0.15, s"est=${est(sa, sb)} true=$trueJ")
    assert(est(sa, sc) < 0.1)
    assert(est(sa, sa) == 1.0)
  }

  test("LSH banding recalls high-jaccard pairs") {
    // jaccard(base, nearDup) ~ 0.82; with 8 bands x 4 rows the collision
    // probability is 1-(1-j^4)^8 ~ 0.98 — must collide in some band.
    val k = 32; val bands = 8
    def bandsOf(t: Seq[String]) =
      DedupFunctions.bandHashesImpl(DedupFunctions.minHashSigImpl(shingleSet(t).toSeq, k).toSeq, bands)
    val collisions = bandsOf(base).zip(bandsOf(nearDup)).count { case (a, b) => a == b }
    assert(collisions >= 1, "near-dup pair must share at least one LSH band")
  }

  test("simhash hamming small for near-dups, large for unrelated") {
    val fa = DedupFunctions.simHash64Impl(base)
    val fb = DedupFunctions.simHash64Impl(nearDup)
    val fc = DedupFunctions.simHash64Impl(unrelated)
    assert(java.lang.Long.bitCount(fa ^ fb) <= 12)
    assert(java.lang.Long.bitCount(fa ^ fc) >= 16)
    assert(DedupFunctions.simHash64Impl(base) == fa) // deterministic
  }

  test("fingerprint bands reconstruct the fingerprint") {
    val fp = 0x123456789abcdef0L
    val parts = DedupFunctions.fpBandsImpl(fp, 4)
    val rebuilt = parts.zipWithIndex.map { case (p, i) => p << (i * 16) }.reduce(_ | _)
    assert(rebuilt == fp)
  }

  test("prefix-filtered all-pairs Jaccard == brute force (planted + random corpora)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // Planted: near-dup pair + unrelated doc, plus 60 random docs over a
    // small vocabulary (seeded → deterministic) so blocks of shared
    // shingles actually occur across unrelated docs.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "the", "of", "and", "run", "fast")
    val randomDocs = (10L until 70L).map { id =>
      val len = 5 + rnd.nextInt(25)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = (Seq((1L, base.mkString(" ")), (2L, nearDup.mkString(" ")),
      (3L, unrelated.mkString(" "))) ++ randomDocs).toDF("doc_id", "text")
    val shingled = docs.select(col("doc_id"),
      array_sort(transform(graft.queries.Dedup.shingles2(split(col("text"), " ")),
        sh => xxhash64(sh))).as("shh"))
    def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    for (t <- Seq(0.12, 0.3, 0.5, 0.8)) {
      val a = shingled.select(col("doc_id").as("a_id"), col("shh").as("a_sh"))
      val b = shingled.select(col("doc_id").as("b_id"), col("shh").as("b_sh"))
      val brute = a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          graft.functions.expr.SimilarityExpressions.jaccardSortedLong(
            col("a_sh"), col("b_sh")).as("j"))
        .where(col("j") >= t)
      val fast = graft.queries.Dedup.allPairsJaccardOn(shingled, t)
      assert(pairsOf(fast) == pairsOf(brute),
        s"prefix filter diverged from brute force at t=$t")
    }
    // the planted near-dup must be found (sanity that thresholds bite)
    val found = graft.queries.Dedup.allPairsJaccardOn(shingled, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(found.contains((1L, 2L)))
  }

  test("PPJoin property: 200 random corpora × random thresholds ≡ brute force") {
    // The positional-filter bound (Dedup.allPairsJaccardOn candidate
    // pruning) is the engine's most safety-critical pruning: a
    // too-tight bound silently drops TRUE pairs at exactly one
    // threshold/size combination. ScalaCheck corpora are tiny sets over
    // a small universe (forcing collisions, ties, and boundary ceil
    // arithmetic at many (|A|, |B|, rk, t) combinations); the brute
    // force is computed driver-side from set definitions — an
    // implementation independent of every Spark kernel under test.
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      nDocs <- Gen.chooseNum(3, 8)
      uni <- Gen.chooseNum(4, 12)
      t <- Gen.choose(0.05, 0.95)
      docs <- Gen.listOfN(nDocs,
        Gen.nonEmptyListOf(Gen.chooseNum(1L, uni.toLong)).map(_.distinct.sorted.toArray))
    } yield (docs, t)
    var checked = 0
    (0 until 210).foreach { i =>
      genCase.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (docs, t) =>
        val df = docs.zipWithIndex.map { case (sh, id) => (id.toLong, sh.toSeq) }
          .toDF("doc_id", "shh")
        val got = graft.queries.Dedup.allPairsJaccardOn(df, t).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        val sets = docs.map(_.toSet)
        val brute = (for {
          a <- docs.indices
          b <- docs.indices if a < b
          inter = sets(a).intersect(sets(b)).size
          j = inter.toDouble / (sets(a).size + sets(b).size - inter).toDouble
          if j >= t
        } yield ((a.toLong, b.toLong), j)).toMap
        assert(got == brute,
          s"case $i (t=$t): got=$got brute=$brute docs=${docs.map(_.toSeq).toSeq}")
        checked += 1
        if (i % 25 == 24) spark.catalog.clearCache() // drop per-case persists
      }
    }
    assert(checked >= 200, s"generator produced only $checked cases")
    spark.catalog.clearCache()
  }

  test("bipartite PPJoin property: 100 random splits ≡ brute force across sides") {
    // crossCorpusJaccardOn routes side-0 prefixes against side-1
    // prefixes with NO a_id < b_id constraint (a bench doc may have a
    // larger id than its train near-dup) — that routing is new logic on
    // top of the shared filters, so it gets its own brute-force gate.
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      nDocs <- Gen.chooseNum(4, 9)
      uni <- Gen.chooseNum(4, 12)
      t <- Gen.choose(0.05, 0.95)
      docs <- Gen.listOfN(nDocs,
        Gen.nonEmptyListOf(Gen.chooseNum(1L, uni.toLong)).map(_.distinct.sorted.toArray))
      sides <- Gen.listOfN(nDocs, Gen.oneOf(0, 1))
    } yield (docs, sides, t)
    var checked = 0
    (0 until 110).foreach { i =>
      genCase.apply(Gen.Parameters.default, Seed(1000L + i)).foreach { case (docs, sides, t) =>
        val df = docs.zip(sides).zipWithIndex
          .map { case ((sh, side), id) => (id.toLong, sh.toSeq, side) }
          .toDF("doc_id", "shh", "side")
        val got = graft.queries.Dedup.crossCorpusJaccardOn(df, t).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        val sets = docs.map(_.toSet)
        val brute = (for {
          a <- docs.indices if sides(a) == 0
          b <- docs.indices if sides(b) == 1
          inter = sets(a).intersect(sets(b)).size
          j = inter.toDouble / (sets(a).size + sets(b).size - inter).toDouble
          if j >= t
        } yield ((a.toLong, b.toLong), j)).toMap
        assert(got == brute,
          s"case $i (t=$t): got=$got brute=$brute sides=$sides docs=${docs.map(_.toSeq).toSeq}")
        checked += 1
        if (i % 25 == 24) spark.catalog.clearCache()
      }
    }
    assert(checked >= 100, s"generator produced only $checked cases")
    spark.catalog.clearCache()
  }

  test("null-text docs never pair: the identical-fp collapse must not group them under the null key") {
    // pre-collapse semantics: a null fingerprint exploded to zero band
    // rows, so null-text docs produced no candidates; the r17 group-by-
    // fingerprint collapse would happily make `null` a group key and
    // intra-pair every null-text doc — pinned here against regression
    import spark.implicits._
    val docs = Seq((1L, Option(base.mkString(" "))), (2L, None: Option[String]),
      (3L, None: Option[String]), (4L, Option(base.mkString(" ") + " extra")))
      .toDF("doc_id", "text")
    val sim = graft.queries.Dedup.simhashPairsOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!sim.exists(p => p._1 == 2L || p._2 == 2L || p._1 == 3L || p._2 == 3L),
      s"null-text docs must not pair: $sim")
    assert(sim.contains((1L, 4L)), "the real near-dup still pairs")
    val (_, mh) = graft.queries.Dedup.minhashLshCandidatesOn(docs)
    val mhp = mh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!mhp.exists(p => p._1 == 2L || p._2 == 2L || p._1 == 3L || p._2 == 3L),
      s"null-text docs must not enter LSH candidates: $mhp")
  }

  test("mega-group expansion: a copy group past the in-row cap routes through the salted join, exact pair count") {
    // intraDocPairs expands groups ≤1024 members with an in-row C(n,2)
    // pair array; ABOVE the cap it must fall back to the salted
    // streaming self-join (a mega-group's pair array would be an O(g²)
    // single-row allocation). This plants a 1100-copy group — over the
    // cap — plus a small 3-copy group (in-row path) and one singleton,
    // and asserts both paths produce exactly their C(n,2) doc pairs,
    // disjointly, with no pair lost or duplicated at the path seam.
    import spark.implicits._
    val big = 1100
    val text = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    val other = "entirely different tokens about spark executors shuffling data across racks"
    val docs = ((1L to big.toLong).map(i => (i, text)) ++
      Seq((5000L, other), (5001L, other), (5002L, other), (9000L, "a lone unrelated sentence")))
      .toDF("doc_id", "text")
    val pairs = graft.queries.Dedup.simhashPairsOn(docs, maxBucket = 10)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    val expected = big.toLong * (big - 1) / 2 + 3L
    assert(pairs.length.toLong == expected,
      s"expected $expected pairs (C($big,2) + C(3,2)), got ${pairs.length}")
    assert(pairs.distinct.length == pairs.length, "a pair was emitted twice across the path seam")
    assert(pairs.forall { case (a, b) => a < b }, "pair order invariant broken")
    assert(!pairs.exists { case (a, b) => a == 9000L || b == 9000L }, "singleton paired")
  }

  test("q29 minhash query finds a planted near-duplicate") {
    import spark.implicits._
    val docs = Seq(
      (1L, base.mkString(" ")), (2L, nearDup.mkString(" ")), (3L, unrelated.mkString(" "))
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("planted")
    // run the same pipeline shape as q29 on the planted frame
    val t = split(col("text"), " ")
    val d = docs.select(col("doc_id"),
        graft.queries.Dedup.shingles2(t).as("sh"))
      .withColumn("sig", DedupFunctions.minHashSig(col("sh"), 32))
      .select(col("doc_id"), col("sh"),
        posexplode(DedupFunctions.bandHashes(col("sig"), 8)).as(Seq("pos", "band")))
    val a = d.select(col("pos"), col("band"), col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = d.select(col("pos"), col("band"), col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val pairs = a.join(b, Seq("pos", "band")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double")).as("j"))
      .distinct().where(col("j") >= 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
  }

  test("a mega-group of exact copies past the member-list bound fails loudly (r17 VERDICT #3)") {
    // distinctTextToks' collect_list is duplication-sized on ONE row;
    // the bound (graft.dedup.maxGroupMembers) must fail with the
    // documented message instead of silently building the row. Plant a
    // tiny bound, flood one text past it, and assert both the loud
    // path and that the same corpus passes once the bound is raised.
    import spark.implicits._
    val docs = ((1L to 50L).map(i => (i, "same text everywhere")) :+
      (99L, "a different document")).toDF("doc_id", "text")
    val prev = sys.props.get("graft.dedup.maxGroupMembers")
    try {
      sys.props("graft.dedup.maxGroupMembers") = "10"
      val ex = intercept[Exception] {
        graft.queries.Dedup.minhashLshCandidatesOn(docs, maxBucket = 100)._2.count()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(m => m.contains("graft.dedup.maxGroupMembers") &&
        m.contains("exact-copy group of 50 members")),
        s"must fail with the documented bound message, got: ${msgs(ex).mkString(" | ")}")
      sys.props("graft.dedup.maxGroupMembers") = "64"
      val pairs = graft.queries.Dedup.minhashLshCandidatesOn(docs, maxBucket = 100)._2
      assert(pairs.count() == 50L * 49 / 2, "above the bound the same corpus expands fully")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.dedup.maxGroupMembers") = v
        case None => sys.props.remove("graft.dedup.maxGroupMembers")
      }
    }
  }
}
