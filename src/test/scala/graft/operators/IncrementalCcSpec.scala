package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[ConnectedComponents.incrementalUpdate]] — the q158 deployment
  * split as an operator — must produce EXACTLY the labels a full
  * recompute over the union graph would, while reading only the stored
  * label table and the delta edges. */
class IncrementalCcSpec extends SparkSpecBase {
  import spark.implicits._

  private def full(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabelPropagation(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def incremental(base: Seq[(Long, Long)], delta: Seq[(Long, Long)],
      driverFallbackEdges: Long = 1000000L): Map[Long, (Option[Long], Long)] =
    ConnectedComponents.incrementalUpdate(
        ConnectedComponents.minLabelPropagation(base.toDF("src", "dst")),
        delta.toDF("a", "b"), driverFallbackEdges = driverFallbackEdges)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .toMap

  test("cluster merge, new-node attach, and pure-new cluster compose exactly") {
    // base: {1,2} {5,6} {10,11}; delta: 2-5 merges two base clusters,
    // 100-10 attaches a new node, 200-201 is an all-new cluster
    val base = Seq((1L, 2L), (5L, 6L), (10L, 11L))
    val delta = Seq((2L, 5L), (100L, 10L), (200L, 201L))
    val got = incremental(base, delta)
    val want = full(base ++ delta)
    assert(got.view.mapValues(_._2).toMap == want, s"labels diverge: $got vs $want")
    // base_comp: stored label for base nodes, null for the new cohort
    assert(got(1L)._1.contains(1L) && got(6L)._1.contains(5L) && got(11L)._1.contains(10L))
    assert(got(100L)._1.isEmpty && got(200L)._1.isEmpty && got(201L)._1.isEmpty)
  }

  test("a delta edge inside one base cluster is a contracted self-loop: labels unchanged") {
    val base = Seq((1L, 2L), (2L, 3L))
    val got = incremental(base, Seq((1L, 3L)))
    assert(got.view.mapValues(_._2).toMap == full(base))
  }

  test("solve path parity: the contracted CC agrees under the forced distributed loop") {
    val base = Seq((1L, 2L), (5L, 6L), (10L, 11L))
    val delta = Seq((2L, 5L), (6L, 10L), (100L, 101L), (101L, 1L))
    val fast = incremental(base, delta)
    val dist = incremental(base, delta, driverFallbackEdges = 0L)
    assert(fast == dist, "driver union-find and distributed contracted solve disagree")
    assert(fast.view.mapValues(_._2).toMap == full(base ++ delta))
  }

  test("chained ingests compose: labels from update N are valid stored state for update N+1") {
    // the real deployment loop — each cohort's output labels (node,
    // comp) become the next cohort's base. Note the select: the
    // operator RETURNS (node, base_comp, comp); the stored-state
    // contract is (node, comp), so the caller projects before chaining.
    val base = Seq((1L, 2L), (5L, 6L))
    val d1 = Seq((2L, 5L), (100L, 101L))          // merge {1,2}+{5,6}; new {100,101}
    val d2 = Seq((101L, 6L), (200L, 1L))          // merge everything except...
    val l0 = ConnectedComponents.minLabelPropagation(base.toDF("src", "dst"))
    val l1 = ConnectedComponents.incrementalUpdate(l0, d1.toDF("a", "b"))
      .select(col("node"), col("comp"))
    val l2 = ConnectedComponents.incrementalUpdate(l1, d2.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(l2 == full(base ++ d1 ++ d2), s"chained labels diverge: $l2")
  }

  test("randomized: incremental over a random base/delta split == full recompute (8 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(5, 40)
      m <- Gen.choose(1, 80)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong)
        b <- Gen.choose(1L, n.toLong) if a != b
      } yield (a, b))
      cut <- Gen.choose(0, edges.size)
    } yield (edges.take(cut), edges.drop(cut))
    (0 until 8).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (base, delta) =>
        if (base.nonEmpty && delta.nonEmpty) {
          val got = incremental(base, delta).view.mapValues(_._2).toMap
          assert(got == full(base ++ delta), s"seed $i: base=$base delta=$delta")
        }
      }
    }
  }
}
