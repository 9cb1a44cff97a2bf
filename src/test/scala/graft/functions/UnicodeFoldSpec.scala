package graft.functions

import graft.SparkSpecBase
import graft.queries.Curation10
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Unicode canonical fold (q168's kernel): NFKC compatibility
  * normalization, full case fold, diacritic strip, letter/digit walk.
  * Three gates: (1) hand-computed Unicode fixtures covering each fold
  * stage; (2) exact agreement with the ASCII kernel on ASCII input —
  * the fast-path equivalence q168's oracle design rests on; (3) the
  * mangle-equivalence premise itself, on the real corpus: the fold of
  * every q168 Unicode mangle equals the fold of its canonical source.
  */
class UnicodeFoldSpec extends SparkSpecBase {
  import spark.implicits._

  private def fold(s: String): String =
    graft.functions.expr.TextKernels
      .unicodeFold(UTF8String.fromString(s)).toString

  test("unicode fixtures: NFKC + case fold + diacritic strip + fold walk") {
    val cases = Seq(
      // diacritics strip to their base letter; punctuation separates
      "Héllo, Wörld!" -> "hello world",
      // ligature fi (NFKC) and fullwidth letters fold to ASCII
      "ﬁnance ＦＵＬＬwidth" -> "finance fullwidth",
      // math alphanumeric compat character folds to its plain letter
      "𝐀lpha" -> "alpha",
      // Turkish dotted capital I: NFKC keeps it, lower gives i +
      // combining dot, the mark strips -> plain i (locale-independent)
      "İstanbul" -> "istanbul",
      // Greek final-sigma SpecialCasing: upper and lower spellings of
      // the same word converge (both end in final sigma after fold)
      "ΜΕΓΆΛΟΣ μεγάλος" ->
        "μεγαλος μεγαλος",
      // sharp s: lowercase survives, capital folds onto it
      "straße STRAẞE" -> "straße straße",
      // CJK letters survive (the ASCII fold erases them); ideographic
      // space (U+3000) is a separator via NFKC
      "日本語　テスト" -> "日本語 テスト",
      // Arabic short vowels (harakat) are combining marks: stripped,
      // glued — never a separator inside the word
      "مُحَمَّد" -> "محمد",
      // astral symbol (G clef) is one separator, not two broken chars
      "a𝄞b" -> "a b",
      // NBSP (NFKC -> space), em-dash, fullwidth ! all separate/trim
      " x—y！ " -> "x y",
      // combining mark on an erased base: e + punct + combining acute --
      // the mark glues to the separator run, not across it
      "" -> "", "́" -> "", "étude" -> "etude")
    cases.foreach { case (in, want) =>
      assert(fold(in) == want,
        s"fold(${in.map(c => f"\\u${c.toInt}%04x").mkString}) = '${fold(in)}', want '$want'")
    }
  }

  test("idempotent: folding a folded string is a no-op") {
    val rng = new scala.util.Random(13)
    val alphabet = IndexedSeq("a", "Z", "9", " ", "!", "é", "Ö",
      "ß", "ﬁ", "Ｅ", "𝄞", "日", " ",
      "́", "Σ", "ς", "İ")
    val rows = (1 to 300).map { _ =>
      (0 until rng.nextInt(24)).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString
    }
    rows.foreach { s =>
      val once = fold(s)
      assert(fold(once) == once,
        s"not idempotent on ${s.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"'$once' -> '${fold(once)}'")
    }
  }

  test("ASCII fast path == ASCII kernel on the corpus and generated garbage") {
    val rng = new scala.util.Random(29)
    val ascii = IndexedSeq("a", "Q", "7", " ", "  ", "!", ".", "\t", "\n", "_", "-")
    val garbage = (1 to 300).map { _ =>
      (0 until rng.nextInt(30)).map(_ => ascii(rng.nextInt(ascii.size))).mkString
    }
    val mismatches = graft.Tables(spark, sfDir).documents.select(col("text"))
      .union(garbage.toDF("text"))
      .where(Curation10.unicodeNormExpr(col("text")) =!=
        Curation10.normExpr(col("text")))
      .count()
    assert(mismatches == 0L)
  }

  test("q168 oracle premise: fold(mangle(text)) == asciiFold(text) on every corpus doc") {
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text"))
    val mangled = Curation10.unicodeMangled(docs)
      .select(col("doc_id") % 3, col("doc_id"),
        Curation10.unicodeNormExpr(col("text")).as("folded"))
    val canon = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), Curation10.normExpr(col("text")).as("canon"))
    val joined = mangled.join(canon, "doc_id")
    assert(joined.count() > 0L, "mangle must produce rows")
    assert(joined.where(col("folded") =!= col("canon")).count() == 0L,
      "a mangled copy's Unicode fold must equal its source's ASCII fold")
  }

  test("interpreted eval path matches codegen (nullSafeEval twin)") {
    val in = "  Café ＦＩNANCE ﬁxed—junk𝄞 İI  "
    val direct = fold(in)
    val Seq(viaPlan) = Seq(in).toDF("s")
      .select(Curation10.unicodeNormExpr(col("s"))).as[String].collect().toSeq
    assert(direct == viaPlan)
  }
}
