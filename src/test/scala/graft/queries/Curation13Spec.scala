package graft.queries

import graft.SparkSpecBase

/** Twins for the release-hygiene batch (q174–q176): each query replayed
  * driver-side from first principles over the sf0.001 corpus, plus the
  * structural invariants (census conservation, repair completeness,
  * utilization monotonicity). Exact cross-engine hashes are the
  * driver's DuckDB gate at sf0.01.
  */
class Curation13Spec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(id: Long, src: String): String = {
    val h = md5hex(s"$id:$src").substring(0, 2)
    if (h < "0d") "val" else if (h < "1a") "test" else "train"
  }

  // -- q174 -------------------------------------------------------------

  test("q174 split leakage: census matches a driver-side cluster replay") {
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val textById = docs.map(d => d._1 -> d._3).toMap
    val content = docs.map { case (id, src, text) =>
      val c =
        if (Seq(0L, 7L, 13L).contains(id % 25))
          textById.getOrElse(id - id % 25, text)
        else text
      (id, src, c)
    }
    val groups = content.groupBy(_._3).values.filter(_.length > 1)
    val expect = groups
      .map { g =>
        g.map { case (id, src, _) => splitOf(id, src) }.distinct.sorted.mkString("+")
      }
      .groupBy(identity)
      .map { case (set, gs) => set -> gs.size }
    val byDocs = groups
      .map { g =>
        (g.map { case (id, src, _) => splitOf(id, src) }.distinct.sorted.mkString("+"),
          g.length)
      }
      .groupBy(_._1).map { case (set, gs) => set -> gs.map(_._2).sum }
    val got = Curation13.q174.run(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val set = r.getString(0)
      assert(r.getLong(1) == expect(set).toLong, s"$set n_groups")
      assert(r.getLong(2) == byDocs(set).toLong, s"$set n_docs")
      assert(r.getBoolean(3) == set.contains("+"), s"$set cross_split")
    }
    // the derived clusters must produce both clean and contaminated sets
    assert(got.exists(_.getBoolean(3)) && got.exists(!_.getBoolean(3)))
  }

  // -- q175 -------------------------------------------------------------

  test("q175 mojibake census: detection/repair replay, repair is complete") {
    val nbsp = " "; val repl = "�"
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dirtied = docs.map { case (id, src, text) =>
      val dirty = text +
        (if (id % 9 == 2) " caffÃ©" else "") +
        (if (id % 9 == 4) " donâ€™t" else "") +
        (if (id % 9 == 6) s" bad${repl}token" else "") +
        (if (id % 9 == 8) s" non${nbsp}break" else "")
      (src, dirty)
    }
    def dirtyOf(s: String): Boolean =
      s.contains("Ã") || s.contains("â€") || s.contains(repl) || s.contains(nbsp)
    val expect = dirtied.groupBy(_._1).map { case (src, rows) =>
      val ds = rows.map(_._2)
      val repaired = ds.map(_.replace("Ã©", "é").replace("â€™", "’")
        .replace(repl, "").replace(nbsp, " "))
      src -> (ds.length.toLong,
        ds.count(_.contains("Ã")).toLong,
        ds.count(_.contains("â€")).toLong,
        ds.count(_.contains(repl)).toLong,
        ds.count(_.contains(nbsp)).toLong,
        ds.count(dirtyOf).toLong,
        ds.zip(repaired).map { case (d, rp) => (d.length - rp.length).toLong }.sum,
        repaired.count(dirtyOf).toLong)
    }
    val got = Curation13.q175.run(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8)) == e, s"${r.getString(0)}")
      // repair completeness: the injected anomaly classes all repair away
      assert(r.getLong(8) == 0L, s"${r.getString(0)} still dirty after repair")
    }
    // the derivation must exercise every anomaly class
    assert(got.map(_.getLong(2)).sum > 0 && got.map(_.getLong(3)).sum > 0 &&
      got.map(_.getLong(4)).sum > 0 && got.map(_.getLong(5)).sum > 0)
  }

  // -- q176 -------------------------------------------------------------

  test("q176 packing curve: per-context replay + monotone utilization") {
    val lens = graft.Tables(spark, sfDir).documents
      .select("text").collect().map(_.getString(0).split(" ", -1).length.toLong)
    val got = Curation13.q176.run(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(32L, 64L, 96L, 128L))
    got.foreach { r =>
      val c = r.getLong(0)
      val kept = lens.map(math.min(_, c)).sum
      assert(r.getLong(1) == lens.length.toLong, s"c$c n_docs")
      assert(r.getLong(2) == lens.count(_ <= c).toLong, s"c$c docs_fit")
      assert(r.getLong(3) == lens.count(_ > c).toLong, s"c$c docs_trunc")
      assert(r.getLong(4) == kept, s"c$c tokens_kept")
      assert(r.getLong(5) == lens.filter(_ < c).map(c - _).sum, s"c$c tokens_padded")
      assert(r.getLong(6) == lens.filter(_ > c).map(_ - c).sum, s"c$c tokens_truncated")
      val utilL = BigDecimal(kept.toDouble * 10000 / (c * lens.length))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(r.getDouble(7) == utilL / 10000.0, s"c$c utilization")
      // conservation: every token is kept or truncated; every slot is
      // kept or padded
      assert(r.getLong(4) + r.getLong(6) == lens.sum, s"c$c token conservation")
      assert(r.getLong(4) + r.getLong(5) == c * lens.length, s"c$c slot conservation")
    }
    // utilization falls as the context grows past the length distribution
    val utils = got.map(_.getDouble(7)).toSeq
    assert(utils == utils.sorted.reverse, s"utilization not monotone: $utils")
    // the corpus must exercise both truncation and padding somewhere
    assert(got.exists(_.getLong(3) > 0) && got.exists(_.getLong(5) > 0))
  }
}
