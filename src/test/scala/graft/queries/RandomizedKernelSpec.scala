package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized engine-vs-driver equivalence for the round-12 release-
  * hygiene kernels (the q167 randomized-equivalence discipline): the
  * Column kernels must agree with a from-first-principles Scala replay
  * on GENERATED corpora, not just the synthetic test corpus —
  * including adversarial inputs the corpus never produces (empty
  * tokens from doubled separators, marker fragments that merge into
  * new markers when a replacement char is stripped). Deterministically
  * seeded; one Spark job per test (inputs batched into one frame).
  */
class RandomizedKernelSpec extends SparkSpecBase {
  import spark.implicits._

  // -- Gopher signal kernel ----------------------------------------------

  test("gopher signals equal a driver replay on 400 random texts (incl. empty-token edges)") {
    val rnd = new Random(12)
    val words = Seq("the", "a", "of", "to", "and", "in", "spark", "data",
      "#", "...", "1234", "x", "Zebra", "qq", "longishword", "")
    val texts = (0 until 400).map { i =>
      // doubled separators generate empty tokens; empty text too
      if (i == 0) "" else
        (0 until (1 + rnd.nextInt(90))).map(_ => words(rnd.nextInt(words.size)))
          .mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Curation12.withGopherSignals(df, col("text"))
      .select("id", "n_words", "mwl_l", "sym_l", "alpha_l", "n_stop", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6))).toMap
    val stop = Set("the", "a", "of", "to", "and", "in")
    texts.zipWithIndex.foreach { case (text, i) =>
      val t = text.split(" ", -1)
      val n = t.length
      def sc(num: Double): Long = BigDecimal(num * 10000 / n)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val mwl = sc(t.map(_.length.toLong).sum.toDouble)
      val sym = sc(t.count(w => w == "#" || w == "...").toDouble)
      val alpha = sc(t.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble)
      val ns = t.toSet.count(stop)
      val keep = n >= 20 && n <= 80 && mwl >= 30000 && mwl <= 100000 &&
        sym <= 1000 && alpha >= 8000 && ns >= 2
      assert(got(i.toLong) == ((n.toLong, mwl, sym, alpha, ns.toLong, keep)),
        s"text #$i ${text.take(60)}")
    }
  }

  // -- Mojibake repair kernel ---------------------------------------------

  test("mojibake repair equals String.replace replay on 400 random marker mixes") {
    val nbsp = " "; val repl = "�"
    val rnd = new Random(13)
    val frags = Seq("plain", "Ã©", "Ã", "©", "â€™", "â€", "™", repl, nbsp,
      "é", "’", " ", "x")
    val texts = (0 until 400).map { i =>
      // i == 0: the adversarial merge — stripping the replacement char
      // CREATES a new Ã© marker, which the post-repair rescan must flag
      if (i == 0) s"Ã${repl}©" else
        (0 until (1 + rnd.nextInt(12))).map(_ => frags(rnd.nextInt(frags.size)))
          .mkString
    }
    def repairRef(s: String): String =
      s.replace("Ã©", "é").replace("â€™", "’").replace(repl, "").replace(nbsp, " ")
    def dirtyRef(s: String): Boolean =
      s.contains("Ã") || s.contains("â€") || s.contains(repl) || s.contains(nbsp)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "dirty")
    val repaired = replace(replace(replace(replace(col("dirty"),
      lit("Ã©"), lit("é")), lit("â€™"), lit("’")), lit(repl), lit("")),
      lit(nbsp), lit(" "))
    val anomaly = repaired.contains("Ã") || repaired.contains("â€") ||
      repaired.contains(repl) || repaired.contains(nbsp)
    val got = df.select(col("id"), repaired.as("rep"), anomaly.as("still"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (rep, still) = got(i.toLong)
      assert(rep == repairRef(t), s"text #$i repair mismatch")
      assert(still == dirtyRef(repairRef(t)), s"text #$i rescan mismatch")
    }
    // the adversarial case really does re-create a marker post-repair
    assert(got(0L)._2, "stripping the replacement char must surface the merged marker")
    // and the census contract holds: a clean rescan means repair is a
    // fixed point (idempotence on the non-adversarial population)
    texts.zipWithIndex.filterNot { case (t, _) => dirtyRef(repairRef(t)) }
      .foreach { case (t, _) =>
        assert(repairRef(repairRef(t)) == repairRef(t))
      }
  }
}
