package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.Row

/** Value-level twins for the lexical-model curation stages: q131/q132
  * recomputed with independent driver-side Scala over the same parquet
  * (the DedupSpec brute-force pattern), q130 gated on tokenizer
  * invariants. The DuckDB hash gate runs driver-side at sf0.01.
  */
class Curation6Spec extends SparkSpecBase {

  private lazy val docs: Seq[(Long, String, String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().toSeq.sortBy(_._1)
  }

  test("q131 matches a driver-side naive-Bayes vote replay") {
    val pos = docs.filter(d => Set("src0", "src1", "src2")(d._4))
    val neg = docs.filter(d => Set("src17", "src18", "src19")(d._4))
    assert(pos.nonEmpty && neg.nonEmpty, "seed slices empty at smoke SF")
    def df(seed: Seq[(Long, String, String, String)]): Map[String, Long] =
      seed.flatMap(_._2.split(' ').distinct).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
    val (pdf, ndf) = (df(pos), df(neg))
    val votes: Map[String, Long] = (pdf.keySet ++ ndf.keySet).map { w =>
      val d = pdf.getOrElse(w, 0L) * neg.size - ndf.getOrElse(w, 0L) * pos.size
      w -> (if (d > 0) 1L else if (d < 0) -1L else 0L)
    }.toMap
    // inner-join semantics: a doc with no seed-known token drops out
    // (matches the Spark plan and the oracle's JOIN)
    val expected = docs.flatMap { case (id, text, _, _) =>
      val ws = text.split(' ').distinct.filter(votes.contains)
      if (ws.isEmpty) None
      else {
        val p = ws.count(votes(_) == 1L).toLong
        val n = ws.count(votes(_) == -1L).toLong
        val m = ws.map(votes).sum
        Some(Row(id, p, n, m, if (m > 0) "keep" else "drop"))
      }
    }
    val got = Curation6.q131.run(spark, sfDir).collect().toSeq
    assert(got == expected)
  }

  test("q132 matches a driver-side boilerplate replay") {
    val grams: Seq[(Long, Seq[String])] = docs.map { case (id, text, _, _) =>
      val w = text.split(' ')
      id -> (if (w.length < 3) Seq.empty[String]
             else w.sliding(3).map(_.mkString(" ")).toSeq)
    }
    val n = docs.size
    val gramDf = grams.flatMap(_._2.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    val boiler = gramDf.filter { case (_, df) => df * 100 >= n && df >= 5 }.keySet
    val expected = grams.collect { case (id, gs) if gs.nonEmpty =>
      val b = gs.count(boiler)
      Row(id, gs.size.toLong, b.toLong, b.toDouble / gs.size)
    }
    val got = Curation6.q132.run(spark, sfDir).collect().toSeq
    assert(got == expected)
  }

  test("q130 fertility invariants: 1 <= tokens/word, tokens <= chars, all langs") {
    val rows = Curation4.q130.run(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet == docs.map(_._3).toSet)
    rows.foreach { r =>
      val (chars, words, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(toks >= words, s"${r.getString(0)}: a word is at least one token")
      assert(toks <= chars, s"${r.getString(0)}: tokens can't outnumber chars")
      assert(r.getDouble(4) == toks.toDouble / words)
      assert(r.getDouble(5) == chars.toDouble / toks)
    }
  }
}
