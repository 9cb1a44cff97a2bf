package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The bounded-heap partial top-k (graft.functions.TopK) must return
  * EXACTLY what the row_number window it replaced returns — (score
  * DESC, id ASC) with Spark double semantics — for any input: ties,
  * duplicated scores, NaN (greatest under java.lang.Double.compare),
  * inputs smaller than k, and buffer-compaction boundaries (>4k rows
  * per group). Randomized against a reference sort; deterministically
  * seeded so failures reproduce. */
class TopKSpec extends SparkSpecBase {

  private def referenceTopK(rows: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    rows.sortWith { case ((i1, s1), (i2, s2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }.take(k)

  test("topKDouble equals the reference ordering on random groups (incl. ties/NaN)") {
    import spark.implicits._
    val scoreGen = Gen.oneOf(
      Gen.choose(-5, 5).map(_.toDouble), // heavy tie mass
      Gen.choose(-1e9, 1e9).map(_ / 1e3),
      Gen.const(Double.NaN), Gen.const(0.0), Gen.const(-0.0))
    val rowsGen = for {
      n <- Gen.choose(0, 60)
      scores <- Gen.listOfN(n, scoreGen)
    } yield scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    (0 until 60).foreach { seed =>
      rowsGen.apply(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val k = 1 + seed % 7
        val got = rows.toDF("id", "score")
          .agg(TopK.topKDouble(k)(col("id"), col("score")).as("top"))
          .select(explode(col("top")).as("e"))
          .select(col("e._1"), col("e._2")).as[(Long, Double)].collect().toSeq
        val want = referenceTopK(rows, k)
        // NaN-tolerant comparison: compare via Double.compare semantics
        assert(got.map(_._1) == want.map(_._1) &&
          got.zip(want).forall { case ((_, a), (_, b)) =>
            java.lang.Double.compare(a, b) == 0 },
          s"seed=$seed k=$k\n got=$got\nwant=$want")
      }
    }
  }

  private def referenceBottomK(rows: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    rows.sortWith { case ((i1, s1), (i2, s2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 < i2)
    }.take(k)

  test("bottomKDouble equals the (score ASC, id ASC) window ordering (incl. ties/NaN/±0.0)") {
    import spark.implicits._
    val scoreGen = Gen.oneOf(
      Gen.choose(-5, 5).map(_.toDouble),
      Gen.choose(-1e9, 1e9).map(_ / 1e3),
      Gen.const(Double.NaN), Gen.const(0.0), Gen.const(-0.0))
    val rowsGen = for {
      n <- Gen.choose(0, 60)
      scores <- Gen.listOfN(n, scoreGen)
    } yield scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    (0 until 60).foreach { seed =>
      rowsGen.apply(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val k = 1 + seed % 7
        val got = rows.toDF("id", "score")
          .agg(TopK.bottomKDouble(k)(col("id"), col("score")).as("top"))
          .select(explode(col("top")).as("e"))
          .select(col("e._1"), col("e._2")).as[(Long, Double)].collect().toSeq
        val want = referenceBottomK(rows, k)
        assert(got.map(_._1) == want.map(_._1) &&
          got.zip(want).forall { case ((_, a), (_, b)) =>
            java.lang.Double.compare(a, b) == 0 },
          s"seed=$seed k=$k\n got=$got\nwant=$want")
      }
    }
  }

  test("bottomKDouble compaction path: 10k rows, heavy ties, exact ascending head") {
    import spark.implicits._
    val rows = (0L until 10000L).map(i => (i, (i % 97).toDouble))
    val got = rows.toDF("id", "score")
      .repartition(8)
      .agg(TopK.bottomKDouble(25)(col("id"), col("score")).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e._1"), col("e._2")).as[(Long, Double)].collect().toSeq
    val want = referenceBottomK(rows, 25)
    assert(got == want)
  }

  test("buffer compaction path: 10k rows in one group, exact head") {
    import spark.implicits._
    // 4k-capacity buffer compacts repeatedly; scores collide heavily so
    // compaction must preserve the id tie-break across refills
    val rows = (0L until 10000L).map(i => (i, (i % 97).toDouble))
    val got = rows.toDF("id", "score")
      .repartition(8) // force multi-partition partials + merge
      .agg(TopK.topKLong(25)(col("id"), col("score").cast("long")).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e._1"), col("e._2")).as[(Long, Long)].collect().toSeq
    val want = referenceTopK(rows, 25).map { case (i, s) => (i, s.toLong) }
    assert(got == want)
  }
}
