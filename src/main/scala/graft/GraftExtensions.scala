package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.Decimal
import graft.functions.expr._

/** SQL surface for the engine's native expressions, in two forms:
  *
  *  - `SparkSessionExtensions` injection for cluster deployment:
  *    `spark.sql.extensions=graft.GraftExtensions`;
  *  - [[GraftFunctions.register]] for an existing session (used by
  *    Verify/Bench/tests).
  *
  * After registration the kernels are callable from SQL:
  * {{{
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_minhash(shingles, 32), graft_simhash(tokens) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.JaccardSizeBound)
  }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("graft_dot", new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_jaccard", new ExpressionInfo(classOf[JaccardDistinct].getName, "graft_jaccard"),
      (es: Seq[Expression]) => JaccardDistinct(es(0), es(1))),
    ("graft_jaccard_hashed", new ExpressionInfo(classOf[JaccardSortedLong].getName, "graft_jaccard_hashed"),
      (es: Seq[Expression]) => JaccardSortedLong(es(0), es(1))),
    ("graft_minhash", new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (es: Seq[Expression]) => MinHashSigExpr(es(0), intLit(es(1), "k"))),
    ("graft_minhash_str", new ExpressionInfo(classOf[MinHashSigStrExpr].getName, "graft_minhash_str"),
      (es: Seq[Expression]) => MinHashSigStrExpr(es(0), intLit(es(1), "k"))),
    ("graft_bands", new ExpressionInfo(classOf[BandHashesExpr].getName, "graft_bands"),
      (es: Seq[Expression]) => BandHashesExpr(es(0), intLit(es(1), "bands"))),
    ("graft_simhash", new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash"),
      (es: Seq[Expression]) => SimHash64Expr(es(0))),
    ("graft_hyperplane_sig", new ExpressionInfo(classOf[HyperplaneSigExpr].getName, "graft_hyperplane_sig"),
      (es: Seq[Expression]) => HyperplaneSigExpr(es(0), intLit(es(1), "bits"))),
    ("graft_fp_bands", new ExpressionInfo(classOf[FpBandsExpr].getName, "graft_fp_bands"),
      (es: Seq[Expression]) => FpBandsExpr(es(0), intLit(es(1), "bands"), intLit(es(2), "width"))),
    ("graft_langid", new ExpressionInfo(classOf[LangIdExpr].getName, "graft_langid"),
      (es: Seq[Expression]) => LangIdExpr(es(0))),
    ("graft_winnow", new ExpressionInfo(classOf[WinnowExpr].getName, "graft_winnow"),
      (es: Seq[Expression]) => WinnowExpr(es(0), intLit(es(1), "kGram"), intLit(es(2), "window"))),
    ("graft_intersect_count", new ExpressionInfo(classOf[IntersectSortedLong].getName, "graft_intersect_count"),
      (es: Seq[Expression]) => IntersectSortedLong(es(0), es(1))),
    ("graft_iso_duration_us", new ExpressionInfo(classOf[IsoDurationMicrosExpr].getName, "graft_iso_duration_us"),
      (es: Seq[Expression]) => IsoDurationMicrosExpr(es(0))),
    ("graft_iso_duration", new ExpressionInfo(classOf[IsoDurationFormatExpr].getName, "graft_iso_duration"),
      (es: Seq[Expression]) => IsoDurationFormatExpr(es(0))),
    ("graft_jaro_winkler", new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
    ("graft_quality_gate", new ExpressionInfo(classOf[QualityGateExpr].getName, "graft_quality_gate"),
      (es: Seq[Expression]) => QualityGateExpr(es(0),
        intLit(es(1), "minTok"), intLit(es(2), "maxTok"),
        doubleLit(es(3), "minTtr"), doubleLit(es(4), "maxRep"))),
    ("graft_norm_text", new ExpressionInfo(classOf[NormalizeTextExpr].getName, "graft_norm_text"),
      (es: Seq[Expression]) => NormalizeTextExpr(es(0))),
    ("graft_norm_unicode", new ExpressionInfo(classOf[UnicodeFoldExpr].getName, "graft_norm_unicode"),
      (es: Seq[Expression]) => UnicodeFoldExpr(es(0))))

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
