package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingSubstringGate.{DocArrival, GramState, SubstringHit}

/** Reshard migration for the sharded gates (r14 VERDICT #4): S is
  * fixed at query start, so scaling a live deployment means STOP →
  * state dump → re-slice → boot S′ shards with initial state. These
  * specs pin the operability contract: a migrated S=4 deployment
  * continues IDENTICALLY to an S=4 deployment that ran uninterrupted
  * from the beginning — same phase-B output rows (incl. corrected /
  * redelivered flags and the replay fence carried in state) and the
  * same final keyed state, shard by shard. */
class ReshardMigrationSpec extends SparkSpecBase {
  import spark.implicits._

  private val L = 6

  // corpus with duplication WITHIN phase A, WITHIN phase B, and
  // ACROSS the A/B boundary (the migration-critical case: the dup is
  // only detectable if the migrated shard actually carries A's state)
  private def corpus: (Seq[DocArrival], Seq[DocArrival]) = {
    val spans = (0 until 12).map(k => (1 to 6).map(i => s"m${k}_$i").mkString(" "))
    val a = Seq(
      DocArrival(1L, "web", s"a1 a2 ${spans(0)} a3", 1L),
      DocArrival(2L, "web", s"b1 ${spans(1)} b2", 2L),
      DocArrival(3L, "news", s"${spans(0)} c1 c2", 3L)) ++ // dup inside A
      (0 until 6).map(k => DocArrival(10L + k, "web", s"p$k ${spans(2 + k)}", 10L + k))
    val b = Seq(
      DocArrival(30L, "web", s"${spans(1)} d1", 30L), // dup ACROSS A->B
      DocArrival(31L, "news", s"e1 ${spans(3)} e2", 31L), // across, again
      DocArrival(32L, "web", s"f1 ${spans(11)}", 32L),
      DocArrival(33L, "web", s"${spans(11)} g1", 33L), // dup inside B
      DocArrival(34L, "news", s"h1 h2 ${spans(4)}", 34L)) // across
    (a, b)
  }

  private def startGate(name: String, shard: Int, shards: Int,
      ckpt: String, init: Option[org.apache.spark.sql.Dataset[(Long, GramState)]] = None) = {
    val input = MemoryStream[DocArrival](spark, 4)
    val q = StreamingSubstringGate.hits(input.toDS(), L,
        shard = shard, shards = shards, initialState = init)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    (input, q)
  }

  private def hitsOf(name: String): Seq[SubstringHit] =
    spark.table(name).as[SubstringHit].collect().toSeq

  private def stateOf(ckpt: String): Map[Long, GramState] =
    StreamingSubstringGate.dumpState(spark, ckpt).collect().toMap

  test("substring gate: S=1 -> S=4 migration continues identically to an uninterrupted S=4 run") {
    val (a, b) = corpus
    val S = 4
    val tmp = java.nio.file.Files.createTempDirectory("reshard").toString

    // ---- old deployment: S=1 over phase A, stopped at a batch boundary
    val (in1, q1) = startGate("mig_s1", 0, 1, s"$tmp/s1")
    in1.addData(a); q1.processAllAvailable(); q1.stop()
    val aHits = hitsOf("mig_s1")
    assert(aHits.nonEmpty, "phase A produced no hits — degenerate corpus")

    // ---- migrate: dump, slice by the new routing, boot 4 shards
    val dump = StreamingSubstringGate.dumpState(spark, s"$tmp/s1")
    val slices = (0 until S).map(sh =>
      StreamingSubstringGate.shardSlice(dump, sh, S))
    assert(slices.map(_.count()).sum == dump.count(), "slices must partition the dump")
    StreamingSubstringGate.preloadGauge(dump.count())
    val migrated = (0 until S).map { sh =>
      val (in, q) = startGate(s"mig_new_$sh", sh, S, s"$tmp/new_$sh",
        init = Some(slices(sh)))
      in.addData(b); q.processAllAvailable(); q.stop()
      sh -> (hitsOf(s"mig_new_$sh"), stateOf(s"$tmp/new_$sh"))
    }.toMap

    // ---- reference: uninterrupted S=4 over A then B
    val reference = (0 until S).map { sh =>
      val (in, q) = startGate(s"mig_ref_$sh", sh, S, s"$tmp/ref_$sh")
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable(); q.stop()
      sh -> (hitsOf(s"mig_ref_$sh"), stateOf(s"$tmp/ref_$sh"))
    }.toMap

    val maxSeqA = a.map(_.seq).max
    (0 until S).foreach { sh =>
      val (migHits, migState) = migrated(sh)
      val (refHits, refState) = reference(sh)
      // phase-B emissions identical per shard (multiset incl. flags):
      // the across-boundary dups only emit if A's state migrated
      val refB = refHits.filter(_.seq > maxSeqA)
      assert(migHits.groupBy(identity).view.mapValues(_.size).toMap ==
        refB.groupBy(identity).view.mapValues(_.size).toMap,
        s"shard $sh phase-B output differs:\n mig=$migHits\n ref=$refB")
      // final keyed state identical per shard (values AND fences)
      assert(migState == refState, s"shard $sh final state differs")
    }

    // across-boundary duplication actually exercised: phase B emitted
    // corrections for firsts that were seen in phase A
    val allMigB = migrated.values.flatMap(_._1)
    assert(allMigB.exists(h => h.corrected && h.docId <= 10 + 6),
      "no correction pointing back into phase A — migration not exercised")

    // and the union across shards equals what a never-stopped S=1 says
    val (inC, qC) = startGate("mig_check_s1", 0, 1, s"$tmp/check_s1")
    inC.addData(a); qC.processAllAvailable()
    inC.addData(b); qC.processAllAvailable(); qC.stop()
    val fullB = hitsOf("mig_check_s1").filter(_.seq > maxSeqA)
    assert(allMigB.groupBy(identity).view.mapValues(_.size).toMap ==
      fullB.groupBy(identity).view.mapValues(_.size).toMap)
  }

  test("cluster index: reshard S=1 -> S=4 serves identical labels and continues identically") {
    val pairs = graft.queries.Dedup.allPairsJaccard(spark, sfDir, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.size >= 4, "need a real pair log")
    val (phaseA, phaseB) = pairs.splitAt(pairs.size / 2)

    def fold(idx: ShardedClusterIndex, ps: Seq[(Long, Long)]): Unit =
      idx.merge(spark.createDataFrame(ps).toDF("a_id", "b_id"))

    // old deployment: S=1 (as a 1-shard ShardedClusterIndex) over A
    val old = new ShardedClusterIndex(1)
    fold(old, phaseA)
    // migrate to S=4, then continue with B
    val migrated = old.reshard(4)
    assert(migrated.labels == old.labels, "reshard must preserve labels")
    fold(migrated, phaseB)
    // reference: S=4 from scratch over A then B
    val reference = new ShardedClusterIndex(4)
    fold(reference, phaseA); fold(reference, phaseB)
    assert(migrated.labels == reference.labels,
      "migrated index diverged from uninterrupted S=4")
  }
}
