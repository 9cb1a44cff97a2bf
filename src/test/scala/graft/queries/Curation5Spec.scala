package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Semantic guarantees of the fifth batch beyond the oracle hash-match:
  * the SQ8 reconstruction bound and ranking fidelity, BM25 score
  * structure, and adversarial completeness of the PII scrub. */
class Curation5Spec extends SparkSpecBase {

  test("q119: SQ8 codes are in int8 range and reconstruct within one step") {
    import spark.implicits._
    // re-derive codes + dequantized values and check the scalar-
    // quantizer guarantee per element: |x - dequant(q)| <= step where
    // step = (mx-mn)/255 (floor-based code -> error < 1 step, plus the
    // cap at 254 which can only shrink toward mn by < 1 step)
    val emb = Tables(spark, sfDir).embeddings
    val dims = emb.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .as[(Int, Float, Float)].collect().sortBy(_._1)
    val mn = dims.map(_._2.toDouble)
    val mx = dims.map(_._3.toDouble)
    val vecs = emb.select("embedding").as[Seq[Float]].collect()
    assert(vecs.nonEmpty)
    vecs.foreach { v =>
      v.zipWithIndex.foreach { case (xf, i) =>
        val x = xf.toDouble
        val step = (mx(i) - mn(i)) / 255.0
        val q =
          if (mx(i) > mn(i))
            math.min(math.floor((x - mn(i)) * 255.0 / (mx(i) - mn(i))).toLong, 254L) - 127L
          else 0L
        assert(q >= -127L && q <= 127L, s"code $q out of int8 range")
        if (mx(i) > mn(i)) {
          val dequant = mn(i) + (q + 127L) * step
          // floor-code reconstruction sits at the step's lower edge:
          // 0 <= x - dequant <= 2*step (cap at 254 adds at most one step)
          assert(x - dequant >= -1e-9 && x - dequant <= 2 * step + 1e-9,
            s"dim $i: x=$x dequant=$dequant step=$step")
        }
      }
    }
  }

  test("sqCode edge cases: constant dim -> 0, range extremes -> ±127") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(3.25f, 5.0f, -1.0f))).toDF("embedding")
      .withColumn("mins", typedLit(Seq(3.25, 0.0, -1.0)))
      .withColumn("maxs", typedLit(Seq(3.25, 5.0, 1.0)))
    val q = df.select(Curation5.sqCode(col("embedding")).as("q")).as[Seq[Long]].head()
    assert(q(0) == 0L, "mx == mn must code to 0, not divide by zero")
    assert(q(1) == 127L, "x == mx hits the 254 cap -> +127")
    assert(q(2) == -127L, "x == mn -> -127")
  }

  test("q121: SQ8 ranking tracks the float ranking (recall@5 and argmax)") {
    import spark.implicits._
    // ranking-fidelity sanity (the analogue of the float indexes'
    // exact-NN witness; the oracle already checks the SQ8 top-5
    // bit-exactly, this checks it against the UNQUANTIZED ranking):
    // the float dot-product argmax must appear in SQ8's top-5 for at
    // least 9 of the 10 queries (recall@5), and the two argmaxes must
    // agree outright for most — near-tied neighbors may swap at int8
    // resolution, which is the quantization trade, not a bug.
    val top5 = Curation5.q121.run(spark, sfDir)
      .select("qid", "cid", "rk").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val emb = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val byId = emb.toMap
    val floatBest = top5.keySet.map { qid =>
      val qv = byId(qid).map(_.toDouble)
      qid -> emb.filter(_._1 != qid).maxBy { case (_, v) =>
        v.map(_.toDouble).zip(qv).map { case (a, b) => a * b }.sum
      }._1
    }.toMap
    val recall5 = top5.keySet.count(qid => top5(qid).contains(floatBest(qid)))
    val agree = top5.keySet.count(qid => top5(qid).head == floatBest(qid))
    assert(recall5 >= 9, s"float argmax inside SQ8 top-5 for only $recall5/10 queries")
    assert(agree >= 6, s"SQ8 argmax agrees with float argmax on only $agree/10 queries")
  }

  test("q118: every returned doc contains a query term and scores are positive") {
    val out = Curation5.q118.run(spark, sfDir)
    import spark.implicits._
    val rows = out.select("tf_join", "tf_window", "tf_stream", "tf_hash", "score")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (a, b, c, d, s) =>
      assert(a + b + c + d > 0, "returned doc matches no query term")
      assert(s > 0.0, "BM25 score must be positive when a term matches")
    }
    // scores arrive in non-increasing order (the top-k contract)
    val scores = out.select("score").as[Double].collect()
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("q125: generic BM25 reproduces q118's ranking for the q118 query") {
    import spark.implicits._
    // qid 0 IS q118's query — the runtime-relation path must rank the
    // same documents in the same order as the fixed-term plan (scores
    // differ only in final ulps: q125 sums per-term contributions in
    // rounded DECIMAL(18,9), q118 in a fixed-order double chain)
    val out = Curation5.q125.run(spark, sfDir)
    val generic = out.where(col("qid") === 0).orderBy("rk")
      .select("doc_id").as[Long].collect().toSeq
    val fixed = Curation5.q118.run(spark, sfDir)
      .select("doc_id").as[Long].collect().toSeq.take(generic.length)
    assert(generic.nonEmpty, "q125 returned nothing for the q118 query")
    assert(generic == fixed,
      s"generic BM25 ranking diverges from q118: $generic vs $fixed")
    // a query whose term is absent from the corpus contributes no rows
    assert(out.where(col("qid") === 4).isEmpty,
      "absent-term query must produce no rows")
    // scores within each query arrive in non-increasing rank order
    val byQ = out.select("qid", "rk", "score").as[(Long, Int, Double)]
      .collect().groupBy(_._1)
    byQ.values.foreach { rows =>
      val s = rows.sortBy(_._2).map(_._3)
      assert(s.zip(s.tail).forall { case (x, y) => x >= y })
    }
  }

  test("q129: fusion rewards dual-evidence docs and never exceeds the 2-run bound") {
    import spark.implicits._
    val out = Curation5.q129.run(spark, sfDir)
      .select("id", "rk", "score").as[(Long, Int, Double)].collect().sortBy(_._2)
    assert(out.nonEmpty && out.length <= 10)
    // scores non-increasing in rank; bounded by the 2-run maximum
    val maxPossible = 2.0 / 61.0 + 1e-9
    out.foreach { case (_, _, s) => assert(s > 0 && s <= maxPossible) }
    assert(out.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // at least one fused doc carries evidence from BOTH runs: its score
    // exceeds anything a single run can contribute (1/61)
    assert(out.exists(_._3 > 1.0 / 61.0 + 1e-12),
      "no document fused evidence from both the lexical and dense runs")
  }

  test("q120: redacted text retains no scrubbable pattern, counts match plants") {
    import spark.implicits._
    // adversarial completeness on a constructed batch: multiple PII
    // instances per row, adjacent punctuation, pattern-inside-pattern
    // (an email whose domain looks IP-ish stays ONE email match).
    val rows = Seq(
      (1L, "plain words only"),
      (2L, "two mails a@b.io and c.d@e-f.org plus 555-1234"),
      (3L, "ip 10.1.2.3 then 555-0000 then x@y.zz end"),
      (4L, "<x@y.io> (10.0.0.1) [555-9999]")
    ).toDF("doc_id", "text")
    // the PRODUCTION patterns and chain — local copies would keep this
    // spec green while a pattern edit silently regressed q120
    val emailRe = Curation5.EmailRe
    val phoneRe = Curation5.PhoneRe
    val ipRe = Curation5.IpRe
    val red = Curation5.scrubExpr(col("text"))
    val out = rows.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phone"),
      size(regexp_extract_all(col("text"), lit(ipRe), lit(0))).as("n_ip"),
      red.as("r"))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 0, 0, 0, "plain words only")))
    assert(out(1)._2 == 2 && out(1)._3 == 1 && out(1)._4 == 0)
    assert(out(2)._2 == 1 && out(2)._3 == 1 && out(2)._4 == 1)
    assert(out(3)._2 == 1 && out(3)._3 == 1 && out(3)._4 == 1)
    // the row-at-a-time string twin (the streaming stage) redacts
    // identically to the column expression
    val byId = Seq(1L -> "plain words only",
      2L -> "two mails a@b.io and c.d@e-f.org plus 555-1234",
      3L -> "ip 10.1.2.3 then 555-0000 then x@y.zz end",
      4L -> "<x@y.io> (10.0.0.1) [555-9999]").toMap
    out.foreach { case (id, _, _, _, r) =>
      assert(r == Curation5.scrubString(byId(id)), s"string/column scrub diverge for doc $id")
    }
    // nothing scrubbable survives any redacted string
    out.map(_._5).foreach { r =>
      assert(!r.matches(s".*$emailRe.*"), s"email survives: $r")
      assert(r.replaceAll(phoneRe, "").length == r.length, s"phone survives: $r")
      assert(r.replaceAll(ipRe, "").length == r.length, s"ip survives: $r")
    }
  }
}
