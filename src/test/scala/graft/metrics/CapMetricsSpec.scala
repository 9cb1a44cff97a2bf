package graft.metrics

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The "no silent caps" gate (r15 VERDICT #2): every bounded drop in
  * the engine must announce itself. Plants a hot LSH bucket over the
  * cap and asserts (a) the capped rows are gone from the OUTPUT exactly
  * as before — the cap's semantics are unchanged — and (b) the drop is
  * COUNTED in [[CapObservatory]] (dropped rows, dropped groups, max
  * group size); below the cap the output is untouched and the counters
  * read zero while max_group still gauges headroom. Delivery rides the
  * async listener bus, so reads go through [[CapObservatory.fence]] —
  * the same drain barrier Bench/StressMain use before their artifacts,
  * which these tests therefore also exercise. */
class CapMetricsSpec extends SparkSpecBase {

  private def fenced(tag: String): Map[String, Long] = {
    CapObservatory.fence(spark)
    CapObservatory.snapshot().getOrElse(tag, Map.empty)
  }

  // (pos, band, doc_id): bucket (0, 7) holds 5 docs, bucket (1, 9) two
  private def banded = {
    import spark.implicits._
    ((1 to 5).map(i => (0, 7L, i.toLong)) ++ Seq((1, 9L, 10L), (1, 9L, 11L)))
      .toDF("pos", "band", "doc_id")
  }

  test("a planted hot bucket over the cap increments the drop metrics") {
    CapObservatory.reset()
    val out = graft.queries.Dedup.capBuckets(banded, maxBucket = 3,
      tag = "spec_hot_bucket").collect()
    assert(out.length == 2, "the 5-doc bucket must be dropped, the 2-doc one kept")
    assert(out.map(_.getLong(2)).sorted.toSeq == Seq(10L, 11L))
    val m = fenced("spec_hot_bucket")
    assert(m("dropped_rows") == 5L && m("dropped_groups") == 1L && m("max_group") == 5L, m)
  }

  test("below the cap: output unchanged, zero drops, max_group still gauges headroom") {
    CapObservatory.reset()
    val out = graft.queries.Dedup.capBuckets(banded, maxBucket = 10,
      tag = "spec_cool_bucket").collect()
    assert(out.length == 7, "no bucket reaches the cap — every row survives")
    val m = fenced("spec_cool_bucket")
    assert(m("dropped_rows") == 0L && m("dropped_groups") == 0L && m("max_group") == 5L, m)
  }

  test("metrics ACCUMULATE across runs: a later clean run never erases a recorded drop") {
    // review r16: last-write-wins would let q177's clean re-execution of
    // the shared minhash tag wipe q29's recorded drop from the artifact
    CapObservatory.reset()
    graft.queries.Dedup.capBuckets(banded, maxBucket = 3, tag = "spec_acc").collect()
    graft.queries.Dedup.capBuckets(banded, maxBucket = 10, tag = "spec_acc").collect()
    val m = fenced("spec_acc")
    assert(m("dropped_rows") == 5L && m("dropped_groups") == 1L,
      s"the clean second run must not erase the first run's drop: $m")
    assert(m("max_group") == 5L)
    // and a second dropping run adds
    graft.queries.Dedup.capBuckets(banded, maxBucket = 3, tag = "spec_acc").collect()
    val m2 = fenced("spec_acc")
    assert(m2("dropped_rows") == 10L && m2("dropped_groups") == 2L, m2)
  }

  test("group-grain cap (ngram block census) counts members and groups") {
    import spark.implicits._
    CapObservatory.reset()
    val blocks = Seq(("the", 12000L), ("rare", 3L), ("mid", 9000L))
      .toDF("first_tok", "block_n")
    val observed = CapObservatory.observeGroupCap(blocks, "spec_block",
      col("block_n"), cap = 10000)
    assert(observed.where(col("block_n") <= 10000).count() == 2)
    val m = fenced("spec_block")
    assert(m("dropped_rows") == 12000L && m("dropped_groups") == 1L &&
      m("max_group") == 12000L, m)
  }

  test("q28's block census metric fires through the BROADCAST side of the real plan") {
    // the observe node sits under broadcast(blockN.where(...)) — if
    // CollectMetrics did not report from a broadcast subtree, the ngram
    // cap would be silently unobserved (the exact failure mode this
    // object closes); pin it on the registered query end-to-end
    CapObservatory.reset()
    graft.SparkEntry.queries("q28_dedup_ngram")(spark, sfDir).collect()
    CapObservatory.fence(spark)
    val m = CapObservatory.snapshot().get("ngram_first_tok_block")
    assert(m.exists(_.getOrElse("max_group", 0L) > 0L),
      s"block census metric missing/empty: ${CapObservatory.snapshot()}")
    assert(m.exists(_("dropped_groups") == 0L), "no block tops 10k at spec SF")
    CapObservatory.reset()
  }

  test("exact-copy flood never engages the banding cap (r16 VERDICT #1)") {
    // The round-16 stress run measured the simhash band cap engaging on
    // identical fingerprints (dropped_rows=17450 at 10×): exact copies
    // share the full fingerprint, so the most-duplicated content — the
    // class a dedup pass exists to catch — piled past maxBucket. The
    // fix collapses identical fingerprints to one representative BEFORE
    // banding; this floods both generators with 3× the cap in exact
    // copies and asserts (a) zero drops, (b) full pair recovery.
    import spark.implicits._
    CapObservatory.reset()
    val copies = 30 // 3× the planted cap of 10
    val text = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    val docs = ((1L to copies.toLong).map(i => (i, text)) :+
      (100L, "completely unrelated words about spark executors shuffling data"))
      .toDF("doc_id", "text")
    val expectPairs = copies.toLong * (copies - 1) / 2
    val sim = graft.queries.Dedup.simhashPairsOn(docs, maxBucket = 10).collect()
    assert(sim.length == expectPairs, s"simhash must recover all ${expectPairs} copy pairs")
    assert(sim.forall(_.getInt(2) == 0), "exact copies have hamming 0")
    val (_, mhPairs) = graft.queries.Dedup.minhashLshCandidatesOn(docs, maxBucket = 10)
    assert(mhPairs.count() == expectPairs, "minhash LSH must recover all copy pairs")
    // and the ngram BLOCK cap (same failure class): 30 identical docs
    // share one (first_tok, shingle-set) group, so the block census
    // sees ONE distinct set — far under a cap of 10 — while all 435
    // intra pairs still emit at jaccard 1
    val shingled = docs.select(col("doc_id"),
      element_at(split(col("text"), " "), 1).as("first_tok"),
      array_sort(array_distinct(transform(
        graft.queries.Dedup.shingles2(split(col("text"), " ")), sh => xxhash64(sh)))).as("shh"))
    val ng = graft.queries.Dedup.ngramPairsOn(shingled, 0.5, maxBlock = 10)
    assert(ng.count() == expectPairs, "ngram block path must recover all copy pairs")
    val snap = { CapObservatory.fence(spark); CapObservatory.snapshot() }
    val blockM = snap.getOrElse("ngram_first_tok_block", Map.empty[String, Long])
    assert(blockM.getOrElse("dropped_groups", 0L) == 0L &&
      blockM.getOrElse("max_group", 99L) <= 2L,
      s"block census must count distinct shingle sets, not docs: $blockM")
    for (tag <- Seq("simhash_band_bucket", "minhash_lsh_bucket")) {
      val m = snap.getOrElse(tag, Map.empty[String, Long])
      assert(m.getOrElse("dropped_rows", 0L) == 0L &&
        m.getOrElse("dropped_groups", 0L) == 0L,
        s"$tag must not drop on an exact-copy flood: $m")
      // and the gauge proves the collapse happened: the largest banded
      // bucket holds DISTINCT fingerprints only (2 here: copy + other)
      assert(m.getOrElse("max_group", 99L) <= 2L, s"$tag banded non-distinct fps: $m")
    }
    CapObservatory.reset()
  }

  test("signature-twin DISTINCT texts are capped (intended delta vs the pre-r17 plan)") {
    // r17 ADVICE: the text-grain collapse narrows the cap-immunity
    // class. Distinct texts with EQUAL SHINGLE SETS (here: "a b"
    // alternated to different lengths — every 2-shingle is "a b" or
    // "b a") share one minhash signature; pre-r17 they collapsed on
    // sig before banding and bypassed maxBucket. Intended behavior
    // NOW: each distinct text enters its band buckets individually, a
    // >maxBucket twin family is capped — LOUDLY — and only exact
    // copies are structurally cap-immune (previous test). These are
    // genuinely distinct documents; an unbounded bucket of them is the
    // pathological hot bucket the cap exists to bound.
    import spark.implicits._
    CapObservatory.reset()
    val twins = 30 // 3× the planted cap of 10, all with shingle set {ab, ba}
    val docs = (1 to twins).map(n => (n.toLong, ("a b " * (n + 1)).trim)).toDF("doc_id", "text")
    assert(docs.select(countDistinct(col("text"))).head.getLong(0) == twins.toLong,
      "construction sanity: every doc is a DISTINCT text")
    val (rels, pairs) = graft.queries.Dedup.minhashLshCandidatesOn(docs, maxBucket = 10)
    assert(rels.count() == twins.toLong, "no two texts are exact copies — no collapse")
    assert(pairs.count() == 0L,
      "every band bucket holds all 30 twins > cap, so the family is capped and pairs drop")
    val m = { CapObservatory.fence(spark); CapObservatory.snapshot() }
      .getOrElse("minhash_lsh_bucket", Map.empty[String, Long])
    assert(m.getOrElse("dropped_groups", 0L) > 0L && m.getOrElse("max_group", 0L) == twins.toLong,
      s"the cap must announce the dropped twin family: $m")
    CapObservatory.reset()
  }

  test("snapshotJson renders a sorted, parse-stable object; fence markers never leak") {
    CapObservatory.reset()
    CapObservatory.fence(spark)
    assert(CapObservatory.snapshotJson() == "{}")
    graft.queries.Dedup.capBuckets(banded, maxBucket = 3, tag = "spec_json").collect()
    CapObservatory.fence(spark)
    val json = CapObservatory.snapshotJson()
    assert(json.startsWith("{\"spec_json\":{"), json)
    assert(json.contains("\"dropped_rows\":5"), json)
    assert(!json.contains("__fence_"), json)
    CapObservatory.reset()
  }
}
