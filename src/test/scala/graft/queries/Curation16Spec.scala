package graft.queries

import graft.SparkSpecBase

/** Twins for the Gopher repetition batch (q185/q186) and line-grain
  * corpus dedup (q187): each query replayed driver-side from first
  * principles over the sf0.001 corpus. q187's replay is the NAIVE
  * corpus-wide line-occurrence count — it validates that the
  * hash-census + equi-join shape computes exactly what a direct
  * grouping of raw line strings would (the no-pair-space reduction),
  * not just the Spark plumbing. Exact cross-engine hashes are the
  * driver's DuckDB gate at sf0.01.
  */
class Curation16Spec extends SparkSpecBase {

  private def sc(num: Double, den: Double): Long =
    BigDecimal(num * 10000 / den).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def chunk(w: Array[String], k: Int): Vector[String] =
    w.grouped(k).map(_.mkString(" ")).toVector

  // mirrors Curation16.derivedLines (element_at is 1-based there)
  private def derivedLines(w: Array[String], id: Long): Vector[String] = {
    val b = chunk(w, Curation16.LineTokens)
    if (b.length >= 3)
      b ++ (if (id % 3 == 0) Vector(b(1)) else Vector.empty) ++
        (if (id % 5 == 0) Vector(b(0), b(2)) else Vector.empty) ++
        (if (id % 7 == 0) Vector(b(0), b(0)) else Vector.empty)
    else b
  }

  private def derivedParas(w: Array[String], id: Long): Vector[String] = {
    val b = chunk(w, Curation16.ParaTokens)
    if (b.length >= 2)
      b ++ (if (id % 4 == 0) Vector(b(0)) else Vector.empty) ++
        (if (id % 11 == 0) Vector(b(1), b(1)) else Vector.empty)
    else b
  }

  private lazy val docs: Seq[(Long, String, String)] =
    graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  // -- q185 -------------------------------------------------------------

  test("q185 duplicate-line/paragraph replay: per-doc recompute matches") {
    val got = Curation16.q185.run(spark, sfDir).collect()
    val byId = docs.map(d => d._1 -> d._3).toMap
    assert(got.length == byId.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val w = byId(id).split(" ", -1)
      val lines = derivedLines(w, id)
      val paras = derivedParas(w, id)
      def dupCnt(v: Vector[String]) = (v.length - v.distinct.length).toLong
      def dupChars(v: Vector[String]) =
        (v.map(_.length.toLong).sum - v.distinct.map(_.length.toLong).sum)
      val dlf = sc(dupCnt(lines).toDouble, lines.length.toDouble)
      val dlcf = sc(dupChars(lines).toDouble, lines.map(_.length.toLong).sum.toDouble)
      val dpf = sc(dupCnt(paras).toDouble, paras.length.toDouble)
      val dpcf = sc(dupChars(paras).toDouble, paras.map(_.length.toLong).sum.toDouble)
      assert(r.getLong(1) == lines.length.toLong, s"doc $id n_lines")
      assert(r.getDouble(2) == dlf / 10000.0, s"doc $id dup_line_frac")
      assert(r.getDouble(3) == dlcf / 10000.0, s"doc $id dup_line_char_frac")
      assert(r.getLong(4) == paras.length.toLong, s"doc $id n_paras")
      assert(r.getDouble(5) == dpf / 10000.0, s"doc $id dup_para_frac")
      assert(r.getDouble(6) == dpcf / 10000.0, s"doc $id dup_para_char_frac")
      val keep = dlf <= 3000 && dpf <= 3000 && dlcf <= 2000 && dpcf <= 2000
      assert(r.getBoolean(7) == keep, s"doc $id keep")
    }
    // the derived duplication must exercise the rules both ways
    assert(got.exists(!_.getBoolean(7)) && got.exists(_.getBoolean(7)))
  }

  // -- q186 -------------------------------------------------------------

  test("q186 top-n-gram replay: per-doc brute-force counter matches") {
    // brute force: count every word n-gram, top = lexicographic max of
    // (count, char length), share = count·len / doc chars
    def topCharLen(w: Array[String], n: Int): Long = {
      if (w.length < n) return 0L
      val counts = (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
        .groupBy(identity).toSeq
        .map { case (g, o) => (o.size.toLong, g.length.toLong) }
      val (c, l) = counts.max
      c * l
    }
    val got = Curation16.q186.run(spark, sfDir).collect()
    val byId = docs.map(d => d._1 -> d._3).toMap
    assert(got.length == byId.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val text = byId(id)
      val w = text.split(" ", -1)
      val t2 = sc(topCharLen(w, 2).toDouble, text.length.toDouble)
      val t3 = sc(topCharLen(w, 3).toDouble, text.length.toDouble)
      val t4 = sc(topCharLen(w, 4).toDouble, text.length.toDouble)
      assert(r.getLong(1) == w.length.toLong, s"doc $id n_words")
      assert(r.getDouble(2) == t2 / 10000.0, s"doc $id top2_share")
      assert(r.getDouble(3) == t3 / 10000.0, s"doc $id top3_share")
      assert(r.getDouble(4) == t4 / 10000.0, s"doc $id top4_share")
      val keep = t2 <= 2000 && t3 <= 1800 && t4 <= 1600
      assert(r.getBoolean(5) == keep, s"doc $id keep")
    }
    assert(got.exists(!_.getBoolean(5)) && got.exists(_.getBoolean(5)))
  }

  // -- q187 -------------------------------------------------------------

  // ground truth for q187/q189: the derived line structure and the
  // naive corpus-wide occurrence count of RAW LINE STRINGS (what the
  // 60-bit hash census + equi-join replaces)
  private lazy val perDocLines: Seq[(Long, String, Vector[String])] = docs.map {
    case (id, src, text) =>
      val b = chunk(text.split(" ", -1), Curation16.LineTokens)
      (id, src,
        if (id % 17 == 0) b :+ Curation16.SentinelLine else b)
  }
  private lazy val lineOcc: Map[String, Int] = {
    val occ = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    perDocLines.foreach { case (_, _, ls) => ls.foreach(occ(_) += 1) }
    occ.toMap.withDefaultValue(0)
  }

  test("q187 line dedup: census+join bill equals naive corpus-wide line grouping") {
    val occ = lineOcc
    case class Bill(nDocs: Long, nAffected: Long, totalLines: Long,
        rmLines: Long, rmChars: Long, nRuns: Long)
    val want = perDocLines.groupBy(_._2).map { case (src, ds) =>
      var affected, rmL, rmC, runs, total = 0L
      ds.foreach { case (_, _, ls) =>
        total += ls.length
        val covered = ls.map(occ(_) >= 2)
        val rm = covered.count(identity)
        if (rm > 0) affected += 1
        rmL += rm
        rmC += ls.zip(covered).collect { case (l, true) => l.length.toLong }.sum
        runs += covered.zipWithIndex.count { case (c, i) =>
          c && (i == 0 || !covered(i - 1)) }
      }
      src -> Bill(ds.size.toLong, affected, total, rmL, rmC, runs)
    }
    val got = Curation16.q187.run(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val b = want(r.getString(0))
      assert(r.getLong(1) == b.nDocs, s"${r.getString(0)} n_docs")
      assert(r.getLong(2) == b.nAffected, s"${r.getString(0)} n_affected")
      assert(r.getLong(3) == b.totalLines, s"${r.getString(0)} total_lines")
      assert(r.getLong(4) == b.rmLines, s"${r.getString(0)} removed_lines")
      assert(r.getLong(5) == b.rmChars, s"${r.getString(0)} removed_chars")
      assert(r.getLong(6) == b.nRuns, s"${r.getString(0)} n_runs")
    }
    // the pass must actually remove something, and not everything
    val rmTot = got.map(_.getLong(4)).sum
    val linesTot = got.map(_.getLong(3)).sum
    assert(rmTot > 0 && rmTot < linesTot)
  }

  // -- q189 -------------------------------------------------------------

  test("q189 purge applied: cleaned text equals driver reassembly; bill matches q187") {
    val got = Curation16.q189.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.size == perDocLines.size)
    perDocLines.foreach { case (id, _, ls) =>
      val kept = ls.filter(lineOcc(_) < 2)
      val (nKept, nRemoved, clean) = got(id)
      assert(nKept == kept.length.toLong, s"doc $id n_kept")
      assert(nRemoved == (ls.length - kept.length).toLong, s"doc $id n_removed")
      assert(clean == kept.mkString(" "), s"doc $id clean_text")
    }
    // the ACTION agrees with the BILL: per-source removed-line totals
    val billBySource = Curation16.q187.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val removedBySource = perDocLines.groupBy(_._2).map { case (src, ds) =>
      src -> ds.map { case (id, _, _) => got(id)._2 }.sum
    }
    removedBySource.foreach { case (src, rm) =>
      assert(rm == billBySource(src), s"$src: applied $rm != billed ${billBySource(src)}")
    }
    // something removed, and at least one doc survives intact
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._2 == 0L))
  }

  // -- q190 -------------------------------------------------------------

  test("q190 paragraph langid: census replays from per-paragraph kernel verdicts") {
    import org.apache.spark.sql.functions.{col, explode}
    // per-paragraph predictions via the SAME kernel q24's oracle proved,
    // census (majority vote, tie-break, fraction) recomputed driver-side
    val paraPreds = spark.createDataFrame(
        perParagraphs.flatMap { case (id, ps) => ps.map(p => (id, p)) })
      .toDF("doc_id", "para")
      .select(col("doc_id"),
        graft.functions.expr.TextExpressions.langId(col("para")).as("pred"))
      .select(col("doc_id"), col("pred.lang").as("plang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = paraPreds.groupBy(_._1).map { case (id, ps) =>
      val counts = ps.groupBy(_._2).map { case (l, o) => (l, o.size.toLong) }
      val (domLang, domC) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      val n = ps.length.toLong
      id -> (n, domLang, domC,
        BigDecimal(domC * 10000.0 / n).setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong / 10000.0, domC < n)
    }
    val got = Curation16.q190.run(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (n, lang, c, cons, mixed) = want(id)
      assert(r.getLong(1) == n, s"doc $id n_paras")
      assert(r.getString(2) == lang, s"doc $id dominant_lang")
      assert(r.getLong(3) == c, s"doc $id n_dominant")
      assert(r.getDouble(4) == cons, s"doc $id consistency")
      assert(r.getBoolean(5) == mixed, s"doc $id mixed")
    }
    // the injection makes mixed documents exist, and most docs stay pure
    assert(got.exists(_.getBoolean(5)) && got.exists(!_.getBoolean(5)))
    // every %9 doc carries the German paragraph: mixed unless fully 'de'
    got.filter(_.getLong(0) % 9 == 0).foreach { r =>
      assert(r.getBoolean(5) || r.getString(2) == "de",
        s"doc ${r.getLong(0)} lost its injected paragraph")
    }
  }

  // -- q191 -------------------------------------------------------------

  test("q191 fluency buckets: tercile order, balance, and doc conservation") {
    val got = Curation16.q191.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val bySource = got.groupBy(_._1)
    val docsPerSource = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    bySource.foreach { case (src, rows) =>
      val byBucket = rows.map(r => r._2 -> r).toMap
      assert(byBucket.keySet == Set(1L, 2L, 3L), s"$src buckets")
      // conservation: every doc lands in exactly one bucket
      assert(rows.map(_._3).sum == docsPerSource(src), s"$src doc count")
      // ntile balance: bucket sizes differ by at most one
      val sizes = rows.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src tercile sizes $sizes")
      // fluency DESC ranking: head's floor >= middle's ceiling >= tail's
      assert(byBucket(1L)._5 >= byBucket(2L)._6, s"$src head/middle overlap")
      assert(byBucket(2L)._5 >= byBucket(3L)._6, s"$src middle/tail overlap")
    }
    // the buckets must actually separate scores somewhere
    assert(got.exists(r => r._5 != r._6))
  }

  // -- q192 -------------------------------------------------------------

  test("q192 token-budget sample: exact greedy-prefix replay per source") {
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val got = Curation16.q192.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7))).toMap
    val bySource = docs.groupBy(_._2)
    assert(got.size == bySource.size)
    bySource.foreach { case (src, ds) =>
      val toks = ds.map { case (id, _, text) => id -> text.split(" ", -1).length.toLong }
      val total = toks.map(_._2).sum
      val w = (h60(src) % 5 + 3).toDouble / 10.0
      val budget = math.round(w * total.toDouble)
      val ordered = toks.sortBy { case (id, _) => (h60(id.toString), id) }
      var cum = 0L
      val kept = ordered.takeWhile { case (_, n) => cum += n; cum <= budget }
      // NOTE takeWhile with side-effecting cum matches the window cut:
      // a doc is kept iff the INCLUSIVE running total fits the budget,
      // and hash order is a prefix property so takeWhile is exact
      val (gBudget, gTotal, gDocs, gKept, gTokens, gUtil, gIdSum) = got(src)
      assert(gBudget == budget, s"$src budget")
      assert(gTotal == total, s"$src total")
      assert(gDocs == ds.size.toLong, s"$src n_docs")
      assert(gKept == kept.length.toLong, s"$src n_kept")
      assert(gTokens == kept.map(_._2).sum, s"$src tokens_kept")
      assert(gIdSum == kept.map(_._1).sum, s"$src kept_id_sum (membership)")
      val util = BigDecimal(kept.map(_._2).sum * 10000.0 / budget)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 10000.0
      assert(gUtil == util, s"$src utilization")
      // the cut must be real: something kept, something dropped
      assert(kept.nonEmpty && kept.length < ds.size, s"$src degenerate cut")
    }
  }

  private lazy val perParagraphs: Seq[(Long, Vector[String])] = docs.map {
    case (id, _, text) =>
      val b = chunk(text.split(" ", -1), Curation16.ParaTokens)
      (id, if (id % 9 == 0) b :+ Curation16.GermanPara else b)
  }

  // -- q188 -------------------------------------------------------------

  test("q188 duplicate-n-gram coverage replay: per-doc brute force matches") {
    // brute force: count each n-gram within the derived doc; a position
    // is covered iff some window starting in [p-n+1, p] holds a gram
    // occurring >= 2 times; fraction = covered word chars / all chars
    def dirty(w: Array[String], id: Long): Array[String] =
      w ++ (if (id % 6 == 0 && w.length >= 12) w.take(12) else Array.empty[String]) ++
        (if (id % 11 == 0 && w.length >= 20) w.take(20) else Array.empty[String]) ++
        (if (id % 7 == 0 && w.length >= 7) w.take(7) else Array.empty[String])
    def fracs(w: Array[String]): Map[Int, Long] = (5 to 10).map { n =>
      val counts = (0 to w.length - n)
        .map(i => w.slice(i, i + n).mkString(" "))
        .groupBy(identity).map { case (g, o) => g -> o.size }
      val dupStart = (0 until w.length).map(i =>
        i <= w.length - n && counts.getOrElse(w.slice(i, i + n).mkString(" "), 0) >= 2)
      val covered = (0 until w.length).map(p =>
        (math.max(0, p - n + 1) to p).exists(dupStart))
      val covChars = w.indices.collect { case p if covered(p) => w(p).length.toLong }.sum
      n -> sc(covChars.toDouble, w.map(_.length.toLong).sum.toDouble)
    }.toMap
    val got = Curation16.q188.run(spark, sfDir).collect()
    val byId = docs.map(d => d._1 -> d._3).toMap
    assert(got.length == byId.size)
    val thresholds = Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L,
      8 -> 1200L, 9 -> 1100L, 10 -> 1000L)
    got.foreach { r =>
      val id = r.getLong(0)
      val f = fracs(dirty(byId(id).split(" ", -1), id))
      (5 to 10).zipWithIndex.foreach { case (n, j) =>
        assert(r.getDouble(1 + j) == f(n) / 10000.0, s"doc $id dup${n}_share")
      }
      val keep = (5 to 10).forall(n => f(n) <= thresholds(n))
      assert(r.getBoolean(7) == keep, s"doc $id keep")
    }
    assert(got.exists(!_.getBoolean(7)) && got.exists(_.getBoolean(7)))
    // the short-span injection must make the per-n signals diverge
    assert(got.exists(r => r.getDouble(1) != r.getDouble(6)),
      "dup5 == dup10 on every doc: injections exercise only one grain")
  }
}
