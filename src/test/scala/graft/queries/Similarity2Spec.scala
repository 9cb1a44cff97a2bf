package graft.queries

import graft.SparkSpecBase

/** The probe sweep's defining properties: widening the probe set can
  * only help (monotone recall — a candidate set grows with np), and the
  * truth baseline covers every query fully. Exactness is the DuckDB
  * oracle's job at sf0.01. */
class Similarity2Spec extends SparkSpecBase {

  test("q153 recall and MRR are monotone in the probe count") {
    val rows = Similarity2.q153.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi._2 >= lo._2, s"hits fell from np=${lo._1} to np=${hi._1}")
        assert(hi._4 >= lo._4, "recall@5 must be monotone in np")
        assert(hi._6 >= lo._6, "MRR must be monotone in np")
      case _ => ()
    }
    rows.foreach { case (np, hits, truthN, recall, top1, mrr) =>
      assert(hits <= truthN)
      assert(recall >= 0.0 && recall <= 1.0 && mrr >= 0.0 && mrr <= 1.0)
      assert(top1 <= truthN / 5, s"np=$np found more top-1s than queries")
    }
    // the truth baseline is complete: 5 neighbors for every query
    val truthN = rows.head._3
    assert(truthN % 5 == 0 && truthN > 0)
  }
}
