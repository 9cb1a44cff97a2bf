package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Twins for the QA batch: the inspection sample replayed driver-side
  * from the same hash ranks, and the label-noise audit's conservation
  * invariants. Exact cross-engine hashes are the driver's DuckDB gate
  * at sf0.01. */
class Curation9Spec extends SparkSpecBase {

  test("q149 sample matches a driver-side hash-rank replay and is stable") {
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("source"), col("doc_id"), col("n_chars"), col("lang"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def h52(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(7).map("%02x".format(_)).mkString.take(13), 16)
    }
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(r => (-h52(r._2), r._2)).take(3).zipWithIndex
        .map { case (r, i) => (src, (i + 1).toLong, r._2, r._3, r._4) }
    }.sortBy(t => (t._1, t._2))
    val got = Curation9.q149.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == expected)
    // deterministic: a second run returns the identical sample
    val again = Curation9.q149.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(again == got)
  }

  test("q150 noise audit conserves the corpus and bounds its rates") {
    val rows = Curation9.q150.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val nVecs = graft.Tables(spark, sfDir).embeddings.count()
    assert(rows.map(_._2).sum == nVecs, "every vector must appear in exactly one class row")
    rows.foreach { case (cls, nv, nPairs, nDis, rate) =>
      assert(nPairs <= 5 * nv, s"class $cls has more than 5 neighbors per vector")
      assert(nDis <= nPairs, s"class $cls disagreement exceeds its pair count")
      assert(rate >= 0.0 && rate <= 1.0)
      if (nPairs > 0) assert(rate == nDis.toDouble / nPairs)
    }
  }

  test("q163 source cap matches a driver-side hash-priority replay") {
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def h52(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(7).map("%02x".format(_)).mkString.take(13), 16)
    }
    val expected = docs.groupBy(_._1).toSeq.map { case (src, rows) =>
      val kept = rows.sortBy(r => (-h52(r._2), r._2)).take(100)
      (src, rows.size.toLong, kept.size.toLong,
        (rows.size - kept.size).toLong, kept.map(_._3).sum)
    }.sortBy(_._1)
    val got = Curation9.q163.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    got.foreach { case (src, nDocs, nKept, nDropped, _) =>
      assert(nKept + nDropped == nDocs, s"$src does not conserve the corpus")
      assert(nKept == math.min(100L, nDocs), s"$src cap not honored")
    }
  }

  test("q164 outlier audit conserves the corpus and is deterministic") {
    def run() = Curation9.q164.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val rows = run()
    val nVecs = graft.Tables(spark, sfDir).embeddings.count()
    assert(rows.map(_._2).sum == nVecs, "every vector must appear in exactly one cell")
    rows.foreach { case (cell, nv, _, nOut) =>
      assert(nv > 0, s"cell $cell is empty but reported")
      assert(nOut >= 0 && nOut <= nv, s"cell $cell outliers out of range")
    }
    assert(rows.map(_._1) == rows.map(_._1).sorted, "cells must report in order")
    assert(run() == rows, "the audit must be deterministic run-to-run")
  }
}
