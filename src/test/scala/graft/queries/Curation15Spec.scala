package graft.queries

import graft.SparkSpecBase

/** q183 exact-substring dedup (Lee et al. 2022 §4.1): the census must
  * equal a TRUE shared-substring brute force — every token covered by
  * a ≥L-token substring occurring more than once in the corpus, merged
  * into maximal spans. The brute force enumerates all (occurrence,
  * occurrence) pairs directly, so these tests validate the L-gram
  * reduction itself (shared-≥L-substring coverage ≡ duplicated-L-gram
  * window coverage), not just the Spark plumbing. */
class Curation15Spec extends SparkSpecBase {

  /** Driver-side ground truth: mark every token position lying inside a
    * length-≥L substring that occurs ≥2 times in the corpus (any two
    * occurrences, same-doc pairs included), then merge into maximal
    * runs. O(n²·L) — fine for planted corpora. */
  private def bruteForce(docs: Seq[(Long, String, String)], L: Int)
      : Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, _, text) => id -> text.split(" ", -1) }
    // collect every L-gram occurrence; a position is covered iff its
    // L-gram occurs >= 2 times (the reduction's RHS) — but compute the
    // LHS here: occurrences of shared substrings of length >= L. Any
    // such substring contains an aligned duplicated L-gram window, so
    // enumerate duplicated L-grams from raw occurrence lists.
    val occ = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, t) <- toks; i <- 0 to t.length - L)
      occ(t.slice(i, i + L).mkString(" ")) += 1
    toks.flatMap { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - L)
        if (occ(t.slice(i, i + L).mkString(" ")) >= 2)
          (i until i + L).foreach(covered(_) = true)
      val dupTokens = covered.count(identity).toLong
      val nSpans = covered.zipWithIndex.count { case (c, i) =>
        c && (i == 0 || !covered(i - 1)) }.toLong
      if (dupTokens > 0) Some(id -> (dupTokens, nSpans)) else None
    }.toMap
  }

  /** Independent check of the REDUCTION: coverage via true maximal
    * shared substrings (pairwise extension) equals coverage via
    * duplicated L-gram windows. */
  private def coverageBySubstringPairs(docs: Seq[(Long, String)], L: Int): Set[(Long, Int)] = {
    val toks = docs.map { case (id, text) => id -> text.split(" ", -1) }
    val out = scala.collection.mutable.Set.empty[(Long, Int)]
    for {
      ((idA, a), ai) <- toks.zipWithIndex
      ((idB, b), bi) <- toks.zipWithIndex
      if ai < bi || (ai == bi && true) // same-doc pairs at distinct offsets below
      i <- a.indices; j <- b.indices
      if !(ai == bi && i == j)
    } {
      var k = 0
      while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
      if (k >= L) {
        (i until i + k).foreach(p => out += ((idA, p)))
        (j until j + k).foreach(p => out += ((idB, p)))
      }
    }
    out.toSet
  }

  test("q183 reduction: duplicated-L-gram coverage equals shared-substring coverage") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 15) {
      val vocab = Vector("a", "b", "c", "d")
      val L = 3 + rnd.nextInt(3)
      val docs = (0L until 6L).map { id =>
        id -> (1 to (L + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val byPairs = coverageBySubstringPairs(docs, L)
      val occ = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      for ((_, text) <- docs; t = text.split(" ", -1); i <- 0 to t.length - L)
        occ(t.slice(i, i + L).mkString(" ")) += 1
      val byGrams = (for {
        (id, text) <- docs; t = text.split(" ", -1); i <- 0 to t.length - L
        if occ(t.slice(i, i + L).mkString(" ")) >= 2
        p <- i until i + L
      } yield (id, p)).toSet
      assert(byGrams == byPairs, s"round $round (L=$L): reduction mismatch")
    }
  }

  test("q183 census matches brute force on a planted corpus (small L)") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ") // an 8-token copied span
    val docs = Seq(
      (1L, "web", s"u1 u2 $shared u3 u4"),              // one copy
      (2L, "web", s"v1 $shared v2 v3 v4 v5"),           // second copy → both covered
      (3L, "books", s"w1 w2 w3 $shared"),               // third copy, other source
      (4L, "books", "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),  // clean
      (5L, "web", s"y1 $shared y2 $shared y3"),         // twice in ONE doc (paper rule)
      (6L, "web", "r r r r r r r r r r r r")            // self-overlapping repeats
    )
    val L = 8
    val truth = bruteForce(docs, L)
    val got = Curation15.exactSubstringCensus(
        docs.toDF("doc_id", "source", "text"), L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    val bySource = docs.groupBy(_._2)
    for ((src, members) <- bySource) {
      val ids = members.map(_._1)
      val totalToks = members.map(_._3.split(" ", -1).length.toLong).sum
      val dupToks = ids.flatMap(truth.get).map(_._1).sum
      val spans = ids.flatMap(truth.get).map(_._2).sum
      val affected = ids.count(truth.contains).toLong
      val (gN, gAff, gTot, gDup, gSp, gRate) = got(src)
      assert(gN == members.size.toLong, s"$src n_docs")
      assert(gAff == affected, s"$src n_affected")
      assert(gTot == totalToks, s"$src total_tokens")
      assert(gDup == dupToks, s"$src dup_tokens: got $gDup want $dupToks")
      assert(gSp == spans, s"$src n_spans: got $gSp want $spans")
      assert(gRate == math.round(dupToks.toDouble * 10000 / totalToks) / 10000.0, s"$src rate")
    }
  }

  test("q183 census matches brute force on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    for (round <- 1 to 10) {
      val vocab = Vector("a", "b", "c")
      val L = 3 + rnd.nextInt(2)
      val docs = (0L until 8L).map { id =>
        (id, if (id % 2 == 0) "even" else "odd",
          (1 to (L + rnd.nextInt(15))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val truth = bruteForce(docs, L)
      val got = Curation15.exactSubstringCensus(docs.toDF("doc_id", "source", "text"), L)
        .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
      for (src <- Seq("even", "odd")) {
        val ids = docs.filter(_._2 == src).map(_._1)
        val want = (ids.flatMap(truth.get).map(_._1).sum, ids.flatMap(truth.get).map(_._2).sum)
        assert(got(src) == want, s"round $round (L=$L) $src: got ${got(src)} want $want")
      }
    }
  }

  test("q184 PII detectors: full recall on injected literals, census reconciles, redaction is terminal") {
    import org.apache.spark.sql.functions._
    val rows = Curation15.q184.run(spark, sfDir).collect()
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    // driver replay of the injection rule → expected per-source counts
    val expect = docs.groupBy(_._2).view.mapValues { g =>
      val e = g.count(_._1 % 7 == 0); val p = g.count(_._1 % 11 == 0)
      val i = g.count(_._1 % 13 == 0)
      val pii = g.count(d => d._1 % 7 == 0 || d._1 % 11 == 0 || d._1 % 13 == 0)
      (g.size.toLong, pii.toLong, e.toLong, p.toLong, i.toLong)
    }.toMap
    rows.foreach { r =>
      val want = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) == want,
        s"${r.getString(0)}: detectors must recall every injected literal, exactly")
      // redaction masks are shorter than any matched literal here
      assert(r.getLong(6) > 0 == (r.getLong(2) + r.getLong(3) + r.getLong(4) > 0))
    }
    // redaction is terminal: a rescan of the redacted text finds nothing
    // (the q175 post-repair-audit discipline) — replay the exact kernel
    val kernel = spark.sql(
      s"""SELECT regexp_replace(regexp_replace(regexp_replace(
         |  'a user7@example.com b +1-555-0042 c 10.1.2.3 d user7@example.com',
         |  '${"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}"}', '<EMAIL>'),
         |  '${"\\\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"}', '<PHONE>'),
         |  '${"([0-9]{1,3}\\\\.){3}[0-9]{1,3}"}', '<IP>') AS red""".stripMargin)
      .collect().head.getString(0)
    assert(kernel == "a <EMAIL> b <PHONE> c <IP> d <EMAIL>", s"got: $kernel")
  }

  test("q183 at the registry threshold runs against the real corpus and is self-consistent") {
    val rows = Curation15.q183.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, aff, tot, dup, sp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(aff <= n && dup <= tot, "census bounds")
      assert((dup == 0) == (sp == 0), "spans iff covered tokens")
      assert(sp <= aff * 100, "sanity: bounded spans per doc")
      // every span covers at least L tokens
      assert(dup >= sp * Curation15.MinDupTokens,
        s"each maximal span must cover >= L tokens: dup=$dup spans=$sp")
    }
  }
}
