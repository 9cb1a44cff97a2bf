package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The in-row C(n,2) pair kernel (graft_pair_structs, r19) must emit
  * EXACTLY what the nested HOF tree it replaced emits for every array
  * the call site can feed it (n ≥ 2 — [[graft.queries.Dedup]] filters
  * `n_members > 1` and caps at IntraExplodeCap): same pairs, same
  * (i, j) emission order, same struct field names/values. The pairs
  * feed the q28/q29/q30 oracle-gated dup-pair outputs, so drift here is
  * a correctness break. */
class PairStructsParitySpec extends SparkSpecBase {
  import spark.implicits._

  /** The replaced formulation, verbatim from r18 Dedup.pairStructs. */
  private def hofPairs(ids: Column): Column =
    flatten(transform(sequence(lit(1), size(ids) - 1),
      i => transform(slice(ids, i + 1, size(ids) - i),
        x => struct(element_at(ids, i).as("a_id"), x.as("b_id")))))

  private def kernelPairs(ids: Column): Column =
    graft.functions.expr.DedupExpressions.pairStructs(ids)

  test("randomized sorted id arrays (n in 2..40): pairs, order, and fields are identical") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      val n = 2 + rng.nextInt(39)
      (i.toLong, Seq.fill(n)(rng.nextLong().abs % 100000L).sorted)
    }
    val df = rows.toDF("gid", "member_ids")
    val diffs = df.select(
        kernelPairs(col("member_ids")).as("k"),
        hofPairs(col("member_ids")).as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diffs == 0)
    // and through the explode (the call-site shape): identical row sets
    val ke = df.select(col("gid"), explode(kernelPairs(col("member_ids"))).as("p"))
      .select(col("gid"), col("p.a_id"), col("p.b_id"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val he = df.select(col("gid"), explode(hofPairs(col("member_ids"))).as("p"))
      .select(col("gid"), col("p.a_id"), col("p.b_id"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(ke == he && ke.nonEmpty)
  }

  test("duplicate ids and the cap-boundary width produce identical pair arrays") {
    val rows = Seq(
      (1L, Seq(7L, 7L, 7L)),                    // all-equal members
      (2L, (1L to 1024L).toSeq),                // IntraExplodeCap width
      (3L, Seq(0L, Long.MaxValue)))             // extreme values
    val df = rows.toDF("gid", "member_ids")
    val diffs = df.select(
        kernelPairs(col("member_ids")).as("k"),
        hofPairs(col("member_ids")).as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diffs == 0)
  }

  test("n < 2 yields an empty pair array (the call-site-excluded degenerate)") {
    val rows: Seq[(Long, Seq[Long])] = Seq((1L, Seq(9L)), (2L, Seq.empty[Long]))
    val out = rows.toDF("gid", "member_ids")
      .select(size(kernelPairs(col("member_ids"))).as("n"))
      .as[Int].collect().toSeq
    assert(out == Seq(0, 0))
  }

  test("null input array propagates to null (UnaryExpression null contract)") {
    val df = Seq((1L, null.asInstanceOf[Seq[Long]])).toDF("gid", "member_ids")
    val r = df.select(kernelPairs(col("member_ids")).as("k")).collect().head
    assert(r.isNullAt(0))
  }
}
