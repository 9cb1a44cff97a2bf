package graft.functions

import graft.SparkSpecBase
import graft.functions.expr.PqExpressions._
import org.apache.spark.sql.functions._

/** The PQ codegen kernels against a naive driver-side reference: encode
  * must pick the true argmin-L2 codeword per segment (ties to the
  * smaller code), and adc(encode(v), distTable(q)) must equal the sum
  * of the chosen codewords' partial distances computed longhand. */
class PqExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  private val M = 4; private val SubDim = 3; private val K = 5

  // deterministic codebook + vectors (no RNG — reproducible failures)
  private def gen(i: Int): Double = math.sin(i * 0.7) * 2.0
  private val cbFlat = Array.tabulate(M * K * SubDim)(gen)
  private val cbNorms = Array.tabulate(M * K) { idx =>
    (0 until SubDim).map(j => cbFlat(idx * SubDim + j)).map(x => x * x).sum
  }
  private val vectors = (0 until 20).map(v => (v.toLong, Array.tabulate(M * SubDim)(j => gen(v * 31 + j)).toSeq))

  private def naiveEncode(v: Seq[Double]): Seq[Int] =
    (0 until M).map { seg =>
      (0 until K).minBy { code =>
        val base = (seg * K + code) * SubDim
        val l2 = (0 until SubDim).map { j =>
          val t = v(seg * SubDim + j) - cbFlat(base + j); t * t
        }.sum
        (l2, code) // ties to smaller code
      }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
    }

  test("pqEncode matches naive per-segment argmin-L2") {
    val df = vectors.toDF("vec_id", "v")
      .select(col("vec_id"), pqEncode(col("v"), cbFlat, cbNorms, M, K, SubDim).as("codes"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vectors.foreach { case (id, v) =>
      assert(got(id) == naiveEncode(v), s"vec $id: ${got(id)} vs ${naiveEncode(v)}")
    }
  }

  test("adc(encode(v), distTable(q)) equals the longhand partial-distance sum") {
    val df = vectors.toDF("vec_id", "v")
    val codes = df.select(col("vec_id"), pqEncode(col("v"), cbFlat, cbNorms, M, K, SubDim).as("codes"))
    val qs = vectors.take(3).map { case (id, v) => (id, v) }.toDF("qid", "qv")
      .select(col("qid"), pqDistTable(col("qv"), cbFlat, cbNorms, M, K, SubDim).as("dt"))
    val got = codes.crossJoin(broadcast(qs))
      .select(col("vec_id"), col("qid"), pqAdc(col("codes"), col("dt"), K).as("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((vid, v) <- vectors; (qid, qv) <- vectors.take(3)) {
      val expected = naiveEncode(v).zipWithIndex.map { case (code, seg) =>
        val base = (seg * K + code) * SubDim
        val dot = (0 until SubDim).map(j => qv(seg * SubDim + j) * cbFlat(base + j)).sum
        cbNorms(seg * K + code) - 2.0 * dot
      }.sum
      assert(math.abs(got((vid, qid)) - expected) < 1e-9,
        s"adc($vid, $qid) = ${got((vid, qid))}, expected $expected")
    }
  }

  test("ADC ordering tracks true L2 ordering on quantized vectors") {
    // when v IS one of the codeword combinations, ADC(q, v) − const
    // equals exact |q − dec(v)|²; check rank-1 agreement on exact-
    // codeword vectors (pure sanity that the table layout is right)
    val exact = (0 until K).map { code =>
      (code.toLong, (0 until M).flatMap { seg =>
        val base = (seg * K + code) * SubDim
        (0 until SubDim).map(j => cbFlat(base + j))
      })
    }
    val df = exact.toDF("vec_id", "v")
    val codes = df.select(col("vec_id"), pqEncode(col("v"), cbFlat, cbNorms, M, K, SubDim).as("codes"))
    val got = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    exact.foreach { case (id, _) =>
      assert(got(id) == Seq.fill(M)(id.toInt), s"exact-codeword vector $id decoded to ${got(id)}")
    }
  }
}
