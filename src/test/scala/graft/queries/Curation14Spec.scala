package graft.queries

import graft.SparkSpecBase

/** Twins for the corpus-composition batch (q178–q179) plus the q177
  * calibration census: driver-side replays from first principles over
  * the sf0.001 corpus and the statistical invariants (χ² ≥ 0,
  * missing-mass bound, novelty ∈ [0,1], calibration bucket sanity).
  * Exact cross-engine hashes are the driver's DuckDB gate at sf0.01.
  */
class Curation14Spec extends SparkSpecBase {

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  // -- q177 -------------------------------------------------------------

  test("q177 minhash calibration: bucket structure and error bounds") {
    val got = Dedup.q177.run(spark, sfDir).collect()
    assert(got.nonEmpty, "LSH produced no candidate pairs at sf0.001")
    got.foreach { r =>
      val (decile, n, est, exact, err) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(decile >= 0 && decile <= 9)
      assert(n > 0)
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      // the bucket mean estimate sits inside its decile (bucket 9
      // absorbs est = 1.0)
      assert(est >= decile / 10.0 - 1e-9 && est < (decile + 1) / 10.0 + (if (decile == 9) 1e-3 else 1e-9),
        s"decile $decile mean_est $est outside bucket")
      // |mean est − mean exact| ≤ mean |err| (triangle inequality)
      assert(math.abs(est - exact) <= err + 1e-9, s"decile $decile error bound")
      assert(err >= 0.0 && err <= 1.0)
    }
    // the corpus's near-dups mean at least one high bucket exists
    assert(got.exists(_.getLong(0) >= 8), "no high-similarity bucket found")
  }

  test("q177 replay: census equals a brute-force recompute over the candidate pairs") {
    // brute force: all pairs that share at least one LSH band, scored
    // exactly — mirrors the oracle's O(n²) scan at test SF
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val P = 2147483647L
    def shingles(text: String): Array[Long] = {
      val t = text.split(" ", -1)
      val sh = if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toArray.distinct
        else t.distinct
      sh.map(h60).distinct.sorted
    }
    def sig(shc: Array[Long]): Array[Long] =
      Array.tabulate(32) { i =>
        shc.map(h => ((i * 40503L + 11L) * (h % P) + (i * 2654435761L) % P) % P).min
      }
    val prepped = docs.map { case (id, t) =>
      val shc = shingles(t); (id, shc, sig(shc)) }
    val cand = for {
      (a, ash, asig) <- prepped; (b, bsh, bsig) <- prepped if a < b
      if (0 until 8).exists(bb => (0 until 4).forall(r => asig(bb * 4 + r) == bsig(bb * 4 + r)))
    } yield {
      val m = (0 until 32).count(i => asig(i) == bsig(i)).toLong
      val inter = ash.intersect(bsh).length.toDouble
      val union = (ash ++ bsh).distinct.length.toDouble
      val exact = inter / union
      (math.min(math.floor(m * 10.0 / 32), 9.0).toLong,
        halfUp(m * 10000.0 / 32), halfUp(exact * 10000))
    }
    val expect = cand.groupBy(_._1).map { case (d, rows) =>
      d -> (rows.length.toLong, rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(r => math.abs(r._2 - r._3)).sum)
    }
    val got = Dedup.q177.run(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, sumEst, sumExact, sumErr) = expect(r.getLong(0))
      assert(r.getLong(1) == n, s"decile ${r.getLong(0)} n_pairs")
      assert(r.getDouble(2) == sumEst.toDouble / n / 10000, s"decile ${r.getLong(0)} mean_est")
      assert(r.getDouble(3) == sumExact.toDouble / n / 10000, s"decile ${r.getLong(0)} mean_exact")
      assert(r.getDouble(4) == sumErr.toDouble / n / 10000, s"decile ${r.getLong(0)} mean_abs_err")
    }
  }

  // -- q178 -------------------------------------------------------------

  test("q178 domain shift: census equals a driver-side chi-square replay") {
    val docs = graft.Tables(spark, sfDir).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sw = docs.flatMap { case (src, t) => t.split(" ", -1).map(w => (src, w)) }
      .groupBy(identity).map { case ((src, w), g) => (src, w, g.length.toLong) }
    val gc = sw.groupBy(_._2).map { case (w, g) => w -> g.map(_._3).sum }
    val nS = sw.groupBy(_._1).map { case (s0, g) => s0 -> g.map(_._3).sum }
    val vocabSeen = sw.groupBy(_._1).map { case (s0, g) => s0 -> g.size.toLong }
    val n = sw.map(_._3).sum
    val expect = sw.groupBy(_._1).map { case (src, rows) =>
      val obsL = rows.map { case (_, w, c) =>
        val e = gc(w).toDouble * nS(src) / n
        val diff = c.toDouble - e
        halfUp(diff * diff / e * 1000000)
      }.sum
      val gS = rows.map { case (_, w, _) => gc(w) }.sum
      val missL = halfUp(nS(src).toDouble * (n - gS) / n * 1000000)
      src -> ((obsL + missL).toDouble / 1000000.0)
    }
    val got = Curation14.q178.run(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) == nS(src), s"$src n_tokens")
      assert(r.getLong(2) == vocabSeen(src), s"$src vocab_seen")
      assert(r.getDouble(3) == expect(src), s"$src chi2")
      assert(r.getDouble(3) >= 0.0, s"$src chi2 negative")
    }
  }

  // -- q180 -------------------------------------------------------------

  test("q180 length drift: census equals a driver-side two-sample KS replay") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val a = docs.filter { case (id, _, _) => md5hex(s"$id:a").head != '0' }
      .map { case (_, src, t) => (src, t.split(" ", -1).length) }
    val b = docs.filter { case (id, _, _) => md5hex(s"$id:b").head != '0' }
      .map { case (id, src, t) =>
        (src, (if (id % 4 == 1) t + " v2" else t).split(" ", -1).length) }
    val sources = (a.map(_._1) ++ b.map(_._1)).distinct
      .filter(s0 => a.exists(_._1 == s0) && b.exists(_._1 == s0))
    val got = Curation14.q180.run(spark, sfDir).collect()
    assert(got.length == sources.length)
    got.foreach { r =>
      val src = r.getString(0)
      val la = a.filter(_._1 == src).map(_._2)
      val lb = b.filter(_._1 == src).map(_._2)
      assert(r.getLong(1) == la.length.toLong, s"$src n_a")
      assert(r.getLong(2) == lb.length.toLong, s"$src n_b")
      val lens = (la ++ lb).distinct.sorted
      val ds = lens.map { t =>
        t -> math.abs(la.count(_ <= t).toDouble / la.length -
          lb.count(_ <= t).toDouble / lb.length)
      }
      val ks = ds.map(_._2).max
      assert(r.getDouble(3) == ks, s"$src ks")
      assert(r.getLong(4) == ds.filter(_._2 == ks).map(_._1).min.toLong, s"$src ks_at")
      assert(ks >= 0.0 && ks <= 1.0)
    }
    // the v2 re-render must move at least one source's distribution
    assert(got.exists(_.getDouble(3) > 0.0))
  }

  // -- q181 -------------------------------------------------------------

  test("q181 split repair: transition census replay + post-repair leak-freeness") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long, src: String): String = {
      val h = md5hex(s"$id:$src").substring(0, 2)
      if (h < "0d") "val" else if (h < "1a") "test" else "train"
    }
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val textById = docs.map(d => d._1 -> d._3).toMap
    val f = docs.map { case (id, src, text) =>
      val content =
        if (Seq(0L, 7L, 13L).contains(id % 25))
          textById.getOrElse(id - id % 25, text)
        else text
      (id, content, splitOf(id, src))
    }
    val straddles = f.groupBy(_._2)
      .map { case (c, g) => c -> (g.map(_._3).distinct.length > 1) }
    val trans = f.map { case (_, c, s0) =>
      (s0, if (straddles(c)) "train" else s0)
    }
    val expect = trans.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = Curation14.q181.run(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == expect(k), s"$k n_docs")
      assert(r.getBoolean(3) == (k._1 != k._2), s"$k moved")
    }
    // conservation + the repair only ever moves INTO train
    assert(got.map(_.getLong(2)).sum == docs.length.toLong)
    assert(got.filter(_.getBoolean(3)).forall(_.getString(1) == "train"))
    assert(got.exists(_.getBoolean(3)), "derived clusters produced no moves")
    // post-repair leak-freeness: no cluster straddles the repaired split
    val repaired = f.map { case (id, c, s0) =>
      (c, if (straddles(c)) "train" else s0)
    }
    repaired.groupBy(_._1).foreach { case (c, g) =>
      assert(g.map(_._2).distinct.length == 1, s"cluster still straddles")
    }
  }

  // -- q182 -------------------------------------------------------------

  test("q182 cross-split overlap: census equals a driver-side gram replay") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long, src: String): String = {
      val h = md5hex(s"$id:$src").substring(0, 2)
      if (h < "0d") "val" else if (h < "1a") "test" else "train"
    }
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Seq[String] = {
      val toks = t.split(" ", -1)
      if (toks.length >= 8) toks.sliding(8).map(_.mkString(" ")).toSeq.distinct
      else toks.toSeq.distinct
    }
    val bySplit = docs.groupBy { case (id, src, _) => splitOf(id, src) }
      .map { case (s0, g) => s0 -> g.flatMap(d => grams(d._3)).toSet }
    val train = bySplit.getOrElse("train", Set.empty)
    val got = Curation14.q182.run(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == Set("val", "test"))
    got.foreach { r =>
      val s0 = r.getString(0)
      val gs = bySplit(s0)
      val inTrain = gs.count(train)
      assert(r.getLong(1) == gs.size.toLong, s"$s0 n_grams")
      assert(r.getLong(2) == inTrain.toLong, s"$s0 n_in_train")
      val rateL = halfUp(inTrain.toDouble * 10000 / gs.size)
      assert(r.getDouble(3) == rateL / 10000.0, s"$s0 overlap_rate")
      // residual substring contamination exists even though q181 made
      // the splits document-leak-free — that gap is the point of q182
      assert(r.getLong(2) > 0, s"$s0 found no residual overlap?")
    }
  }

  // -- q179 -------------------------------------------------------------

  test("q179 source novelty: census equals a driver-side gram replay") {
    val docs = graft.Tables(spark, sfDir).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val g = docs.flatMap { case (src, t) =>
      val toks = t.split(" ", -1)
      val grams = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
        else toks.toSeq.distinct
      grams.map(gram => (src, gram))
    }.distinct
    val nSrc = g.groupBy(_._2).map { case (gram, rows) => gram -> rows.size }
    val expect = g.groupBy(_._1).map { case (src, rows) =>
      val nGrams = rows.size.toLong
      val nUnique = rows.count { case (_, gram) => nSrc(gram) == 1 }.toLong
      src -> (nGrams, nUnique)
    }
    val got = Curation14.q179.run(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nGrams, nUnique) = expect(r.getString(0))
      assert(r.getLong(1) == nGrams, s"${r.getString(0)} n_grams")
      assert(r.getLong(2) == nUnique, s"${r.getString(0)} n_unique")
      val novL = halfUp(nUnique.toDouble * 10000 / nGrams)
      assert(r.getDouble(3) == novL / 10000.0, s"${r.getString(0)} novelty")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // the shared synthetic vocabulary must produce non-trivial overlap
    assert(got.exists(_.getDouble(3) < 1.0), "no cross-source grams at all?")
  }
}
