package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Twins for the pre-training-hygiene batch (q170–q173): each query
  * replayed driver-side from first principles over the sf0.001 corpus,
  * plus the structural invariants (cap conservation, split partition,
  * margin ≥ 1). Exact cross-engine hashes are the driver's DuckDB gate
  * at sf0.01.
  */
class Curation12Spec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // -- q170 -------------------------------------------------------------

  test("q170 gopher rules replay: keep flags match a direct per-doc recompute") {
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Curation12.q170.run(spark, sfDir).collect()
    assert(got.length == docs.size)
    val stop = Set("the", "a", "of", "to", "and", "in")
    got.foreach { r =>
      val id = r.getLong(0)
      val dirty = docs(id) +
        (if (id % 7 == 0) " # # #" else "") +
        (if (id % 11 == 0) " ... ... ..." else "") +
        (if (id % 13 == 0) " 1234 99 7" else "")
      val t = dirty.split(" ", -1)
      val n = t.length
      // scaled-integer rounding, the query's cross-engine discipline
      def sc(num: Double): Long = BigDecimal(num * 10000 / n)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val mwlL = sc(t.map(_.length.toLong).sum.toDouble)
      val symL = sc(t.count(w => w == "#" || w == "...").toDouble)
      val alphaL = sc(t.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble)
      val nStop = t.toSet.count(stop)
      assert(r.getLong(1) == n, s"doc $id n_words")
      assert(r.getDouble(2) == mwlL / 10000.0, s"doc $id mean_word_len")
      assert(r.getDouble(3) == symL / 10000.0, s"doc $id symbol_ratio")
      assert(r.getDouble(4) == alphaL / 10000.0, s"doc $id alpha_ratio")
      assert(r.getLong(5) == nStop, s"doc $id n_stop")
      val keep = n >= 20 && n <= 80 && mwlL >= 30000 && mwlL <= 100000 &&
        symL <= 1000 && alphaL >= 8000 && nStop >= 2
      assert(r.getBoolean(6) == keep, s"doc $id keep")
    }
    // the derived dirt must actually exercise the rules both ways
    assert(got.exists(!_.getBoolean(6)) && got.exists(_.getBoolean(6)))
  }

  // -- q171 -------------------------------------------------------------

  test("q171 domain cap: conservation + top-8-by-quality replay") {
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDom = docs.groupBy { case (id, _) => s"d${id % 37}.example.com" }
    val got = Curation12.q171.run(spark, sfDir).collect()
    assert(got.length == byDom.size)
    got.foreach { r =>
      val (dom, nDocs, nKept, nDropped, charsKept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val members = byDom(dom)
      assert(nDocs == members.length)
      assert(nKept == math.min(8L, members.length))
      assert(nKept + nDropped == nDocs)
      val expectKept = members.sortBy { case (id, c) => (-c, id) }.take(8)
      assert(charsKept == expectKept.map(_._2).sum, s"$dom chars_kept")
    }
    // the sf0.001 corpus must actually overflow the cap somewhere
    assert(got.exists(_.getLong(3) > 0))
  }

  // -- q172 -------------------------------------------------------------

  test("q172 hash split: md5 replay partitions every (source) exactly") {
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def splitOf(id: Long, src: String): String = {
      val h = md5hex(s"$id:$src").substring(0, 2)
      if (h < "0d") "val" else if (h < "1a") "test" else "train"
    }
    val expect = docs.groupBy { case (id, src, _) => (src, splitOf(id, src)) }
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._3).sum) }
    val got = Curation12.q172.run(spark, sfDir).collect()
    assert(got.length == expect.size)
    val bySrcTotal = docs.groupBy(_._2).map { case (s0, v) => s0 -> v.size.toLong }
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (nDocs, nChars) = expect(key)
      assert(r.getLong(2) == nDocs, s"$key n_docs")
      assert(r.getLong(3) == nChars, s"$key n_chars")
      val pctL = BigDecimal(nDocs.toDouble * 10000 / bySrcTotal(key._1))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(r.getDouble(4) == pctL / 10000.0, s"$key pct")
    }
    // every split must be populated somewhere at 500 docs (13/256 ≈ 5%
    // per holdout split ⇒ expected ~26 docs each)
    val splits = got.map(_.getString(1)).toSet
    assert(splits == Set("train", "val", "test"))
  }

  // -- q173 -------------------------------------------------------------

  test("q173 knn margin: brute-force replay + margin/confidence invariants") {
    val vecs = graft.Tables(spark, sfDir).embeddings
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    // BigDecimal HALF_UP, not math.rint (rint is half-to-EVEN and would
    // diverge from the engines' HALF_UP on exact-half scaled values)
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val quant = vecs.map { case (id, v) =>
      id -> v.map(x => halfUp(x * 1000).toDouble) }.toMap
    def cosL(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      halfUp(dot / math.sqrt(na * nb) * 10000)
    }
    val got = Curation12.q173.run(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val qid = r.getLong(0)
      val top = quant.toSeq.filter(_._1 != qid)
        .map { case (cid, v) => (cid, cosL(quant(qid), v)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(8)
      val bestL = top.head._2; val sumL = top.map(_._2).sum; val k = top.size
      assert(r.getLong(1) == top.head._1, s"q$qid best_cid")
      assert(r.getDouble(2) == bestL.toDouble / 10000, s"q$qid best_cos")
      assert(r.getDouble(3) == sumL.toDouble / k / 10000, s"q$qid mean_cos")
      if (sumL > 0) {
        val marginL = halfUp(bestL.toDouble * k * 10000 / sumL)
        assert(r.getDouble(4) == marginL.toDouble / 10000.0, s"q$qid margin")
        assert(r.getBoolean(5) == (marginL >= 10500), s"q$qid confident")
        // best is a member of the top-8 pool ⇒ best·k ≥ sum ⇒ margin ≥ 1
        assert(r.getDouble(4) >= 1.0 && r.getDouble(2) >= r.getDouble(3))
      } else {
        // cosines can be negative: a non-positive top-8 sum must yield
        // null margin / not-confident, never an Infinity division
        assert(r.isNullAt(4), s"q$qid margin must be null when sum_l <= 0")
        assert(!r.getBoolean(5), s"q$qid must not be confident when sum_l <= 0")
      }
    }
  }

  test("q173 margin kernel guards non-positive top-k sums (no Infinity division)") {
    // the exact margin projection from q173, exercised on the branch the
    // synthetic embeddings never hit: an all-negative neighborhood
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    import spark.implicits._
    val df = Seq((1L, 9000L, -500L, 8L), (2L, 9000L, 40000L, 8L))
      .toDF("qid", "best_l", "sum_l", "k")
      .select(col("qid"), col("sum_l"),
        when(col("sum_l") > 0,
          round(col("best_l").cast("double") * col("k") * 10000 / col("sum_l"))
            .cast(LongType)).as("margin_l"))
      .select(col("qid"),
        (col("margin_l").cast("double") / 10000.0).as("margin"),
        ((col("sum_l") > 0) && (col("margin_l") >= 10500)).as("confident"))
      .orderBy("qid").collect()
    assert(df(0).isNullAt(1) && !df(0).getBoolean(2), "sum_l<0 → null margin, not confident")
    assert(df(1).getDouble(1) == 1.8 && df(1).getBoolean(2), "positive sum keeps the kernel")
  }
}
