package graft.queries

import graft.SparkSpecBase

/** q196 (doc-grain near-dup purge applied) against q136 (the plan it
  * executes): identical cluster membership, identical canonicals, and
  * a conserved bill — the purge drops exactly n_members − 1 docs per
  * cluster and nothing else. */
class NearDupPurgeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("purge-applied agrees with the q136 plan: canonicals, membership, bill") {
    val plan = Curation6.q136.run(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("canonical_id"))).toMap
    val applied = Curation17.q196.run(spark, dir).collect()

    // every q136 cluster appears in the applied output with the same
    // membership count and the same (unique, kept) canonical
    val byCluster = applied.filter(_.getAs[Long]("n_members") > 1)
      .groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.keySet == plan.keySet)
    byCluster.foreach { case (cid, rows) =>
      val (nm, canon) = plan(cid)
      assert(rows.length == nm, s"cluster $cid membership")
      val kept = rows.filter(_.getAs[Boolean]("keep"))
      assert(kept.map(_.getAs[Long]("doc_id")).toSeq == Seq(canon),
        s"cluster $cid canonical")
      assert(rows.forall(_.getAs[Long]("canonical_id") == canon),
        s"cluster $cid remap")
    }

    // bill conservation: drops = sum(n_members - 1); singletons all keep
    val drops = applied.count(!_.getAs[Boolean]("keep"))
    assert(drops == plan.values.map(_._1 - 1).sum)
    assert(applied.filter(_.getAs[Long]("n_members") == 1)
      .forall(_.getAs[Boolean]("keep")))

    // kept rows carry a content fingerprint; dropped rows carry none
    assert(applied.forall(r =>
      (r.getAs[Long]("text_fp") != 0L) == r.getAs[Boolean]("keep")))

    // corpus conservation: one row per document
    assert(applied.length == 500 &&
      applied.map(_.getAs[Long]("doc_id")).distinct.length == 500)
  }
}
