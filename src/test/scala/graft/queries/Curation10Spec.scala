package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Twins for the hygiene/versioning batch: both queries replayed
  * driver-side from first principles (same md5, same normalization
  * chain, same snapshot derivations) plus their conservation
  * invariants. Exact cross-engine hashes are the driver's DuckDB gate
  * at sf0.01. */
class Curation10Spec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // Locale.ROOT case maps: the replay must match Spark's locale-
  // independent lower()/upper(), not the default-locale JVM ones
  // (tr_TR maps i->İ and breaks the fingerprints)
  private val Root = java.util.Locale.ROOT
  private def norm(s: String): String =
    s.toLowerCase(Root).replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  /** Brute-force Lee-et-al purge — the one replay both the sf test and
    * the randomized-corpus test compare against. */
  private def bruteForcePurge(corpus: Seq[(Long, String)]): Seq[(Long, Long, Long, String)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }.toMap
    val spans = toks.toSeq.flatMap { case (id, w) =>
      if (w.length >= 8) (0 to w.length - 8).map(i => (id, i, w.slice(i, i + 8).mkString(" ")))
      else Seq.empty
    }
    val bySpan = spans.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
      .map { case (sp, occ) => sp -> occ.map(_._1).min }
    val spansByDoc = spans.groupBy(_._1)
    toks.toSeq.map { case (id, w) =>
      val cut = Array.fill(w.length)(false)
      spansByDoc.getOrElse(id, Seq.empty).foreach { case (_, i, sp) =>
        bySpan.get(sp).foreach { k => if (k != id) (i until i + 8).foreach(cut(_) = true) }
      }
      val kept = w.zipWithIndex.collect { case (t, i) if !cut(i) => t }
      (id, w.length.toLong, cut.count(identity).toLong, md5hex(kept.mkString(" ")))
    }.sortBy(_._1)
  }

  private def docs() =
    graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q165 census matches a driver-side normalize+hash replay") {
    val base = docs()
    val dirty = base ++ base.filter(_._1 % 3 == 0)
      .map { case (id, src, t) => (id + 10000000L, src, "  " + t.toUpperCase(Root) + " !! ") }
    val expected = dirty
      .map { case (_, src, t) => (src, md5hex(t), md5hex(norm(t))) }
      .groupBy(r => (r._1, r._3)).toSeq
      .map { case ((src, _), rows) =>
        (src, rows.size.toLong, rows.map(_._2).distinct.size.toLong) }
      .groupBy(_._1).toSeq
      .map { case (src, groups) =>
        (src, groups.map(_._2).sum, groups.map(_._3).sum, groups.size.toLong,
          groups.count(_._3 >= 2).toLong) }
      .sortBy(_._1)
    val got = Curation10.q165.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q165 invariants: planted mangles merge, distinct counts are ordered") {
    val base = docs()
    val nPlanted = base.count(_._1 % 3 == 0).toLong
    val rows = Curation10.q165.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).sum == base.length + nPlanted,
      "census must conserve every dirty-relation row")
    rows.foreach { case (src, nDocs, nRaw, nNorm, nMerged) =>
      assert(nNorm <= nRaw, s"$src: normalized distinct exceeds raw distinct")
      assert(nRaw <= nDocs, s"$src: raw distinct exceeds doc count")
      assert(nMerged <= nNorm, s"$src: merged groups exceed group count")
    }
    // every planted copy differs from its original byte-wise but is
    // identical normalized, so SOME merging must be visible overall
    assert(rows.map(r => r._3 - r._4).sum >= nPlanted,
      "each planted case/punct copy must fold into its original's group")
  }

  test("q166 churn census matches a driver-side snapshot replay") {
    val base = docs()
    val a = base.filter(_._1 % 10 != 7)
      .map { case (id, src, t) => id -> ((src, md5hex(t))) }.toMap
    val b = base.filter(_._1 % 10 != 3)
      .map { case (id, src, t) =>
        id -> ((src, md5hex(if (id % 4 == 1) t + " v2" else t))) }.toMap
    val expected = (a.keySet ++ b.keySet).toSeq
      .map { id =>
        val src = b.get(id).map(_._1).orElse(a.get(id).map(_._1)).get
        val st =
          if (!a.contains(id)) "added"
          else if (!b.contains(id)) "removed"
          else if (a(id)._2 != b(id)._2) "changed"
          else "unchanged"
        (src, st)
      }
      .groupBy(_._1).toSeq
      .map { case (src, rows) =>
        val c = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
        (src, c.getOrElse("added", 0L), c.getOrElse("removed", 0L),
          c.getOrElse("changed", 0L), c.getOrElse("unchanged", 0L)) }
      .sortBy(_._1)
    val got = Curation10.q166.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q166 conserves the union of both snapshots") {
    val base = docs()
    val idsA = base.filter(_._1 % 10 != 7).map(_._1).toSet
    val idsB = base.filter(_._1 % 10 != 3).map(_._1).toSet
    val rows = Curation10.q166.run(spark, sfDir).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
    assert(total == (idsA ++ idsB).size.toLong,
      "every document in either snapshot is counted exactly once")
    // the planted derivations guarantee all four statuses occur
    assert(rows.map(_.getLong(1)).sum > 0, "no added docs — derivation degenerate")
    assert(rows.map(_.getLong(2)).sum > 0, "no removed docs — derivation degenerate")
    assert(rows.map(_.getLong(3)).sum > 0, "no changed docs — derivation degenerate")
    assert(rows.map(_.getLong(4)).sum > 0, "no unchanged docs — derivation degenerate")
  }

  test("q167 purge matches a driver-side Lee-et-al replay") {
    val expected = bruteForcePurge(docs().map { case (id, _, t) => (id, t) })
    val got = Curation10.q167.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected)
  }

  test("q167 invariants: keepers intact, untouched docs fingerprint-stable") {
    val base = docs()
    val rawFp = base.map { case (id, _, t) => id -> md5hex(t) }.toMap
    val rows = Curation10.q167.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length == base.length, "every document gets a purge record")
    rows.foreach { case (id, nTok, nRem, fp) =>
      assert(nRem <= nTok, s"doc $id removes more tokens than it has")
      if (nRem == 0) assert(fp == rawFp(id), s"untouched doc $id changed fingerprint")
      else assert(fp != rawFp(id), s"doc $id lost $nRem tokens but kept its fingerprint")
    }
    assert(rows.map(_._3).sum > 0, "corpus has cross-doc spans; purge must cut some")
  }

  test("q167 purge equals brute force on randomized dense-duplication corpora") {
    // Tiny vocab + short docs force the edge cases the real corpus
    // never hits: docs shorter than a span, docs that lose EVERY
    // token (fp_clean of the empty string), spans duplicated within
    // one doc only (not removable), and keeper docs that are
    // themselves cut by OTHER spans.
    val vocab = Array("a", "b") // 2^8 = 256 possible spans → dense cross-doc collisions
    val rng = new scala.util.Random(42)
    var totalRemoved = 0L
    for (trial <- 1 to 15) {
      val corpus = (0L until 12L).map { id =>
        val len = rng.nextInt(16) // 0..15 tokens
        (id, Array.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      val expected = bruteForcePurge(corpus)
      import spark.implicits._
      val got = Curation10.spanPurgeOn(corpus.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(got == expected, s"trial $trial diverged on corpus: $corpus")
      totalRemoved += got.map(_._3).sum
    }
    assert(totalRemoved > 0, "no trial produced a removal — generator degenerate")
  }

  test("q167 hot span: one boilerplate line in 500 docs purges everywhere but the keeper") {
    // the Zipf-head case the span join must survive: a single span's
    // occurrence list is 500 deep (all probe rows land on one key).
    // Each doc = 4 unique lead tokens + the shared 8-token boilerplate:
    // unique windows all mix doc-specific tokens, so ONLY the pure
    // boilerplate span (the last window) duplicates across docs.
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val corpus = (0L until 500L).map(id => (id, s"u${id}a u${id}b u${id}c u${id}d " + boiler))
    val got = Curation10.spanPurgeOn(corpus.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got.size == 500)
    val (keeper, rest) = got.partition(_._1 == 0L)
    assert(keeper.head._3 == 0L, "keeper doc must lose nothing")
    assert(keeper.head._4 == md5hex(corpus.head._2))
    rest.foreach { case (id, nTok, nRem, fp) =>
      assert(nTok == 12L && nRem == 8L, s"doc $id: expected exactly the boilerplate cut")
      assert(fp == md5hex(s"u${id}a u${id}b u${id}c u${id}d"), s"doc $id wrong residue")
    }
  }
}
