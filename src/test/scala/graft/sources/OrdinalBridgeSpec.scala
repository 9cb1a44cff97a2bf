package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The ordinal-bridge algorithm (the aws adapter's hard part — Long
  * engine checkpoints over opaque 186-bit AWS sequence strings) proved
  * offline: the SAME [[KinesisApiConformance]] kit that gates the
  * in-memory double runs against [[OrdinalBridgedKinesis]] over the
  * opaque-sequence double, plus the two properties the kit can't see —
  * replay idempotence (re-reading a checkpoint re-assigns identical
  * ordinals) and cross-worker takeover through the shared bridge. */
class OrdinalBridgedKinesisConformance extends KinesisApiConformance("ordinal-bridged") {
  override protected def fixture(): Option[KinesisConformanceFixture] =
    Some(new KinesisConformanceFixture {
      private val opaque = new OpaqueInMemoryKinesis
      val stream = "bridged-stream"
      opaque.inner.createShard(stream, "shard-0")
      val api = new OrdinalBridgedKinesis(opaque, new InMemorySequenceBridge)
      private var n = 0
      override def split(parent: String): (String, String) = {
        n += 1
        val (a, b) = (s"$parent-a$n", s"$parent-b$n")
        opaque.inner.splitShard(stream, parent, a, b)
        (a, b)
      }
    })
}

class OrdinalBridgeSpec extends AnyFunSuite {

  private def fresh(): (OpaqueInMemoryKinesis, InMemorySequenceBridge) = {
    val o = new OpaqueInMemoryKinesis
    o.inner.createShard("s", "sh")
    (1 to 20).foreach(i => o.inner.append("s", "sh", s"pk$i", s"d$i"))
    (o, new InMemorySequenceBridge)
  }

  test("replay idempotence: re-reading from a checkpoint re-assigns identical ordinals") {
    val (o, b) = fresh()
    val api = new OrdinalBridgedKinesis(o, b)
    val first = api.getRecords("s", "sh", 0L, 7)
    val again = api.getRecords("s", "sh", 0L, 7)
    assert(first.records == again.records, "same checkpoint, same log → same ordinals")
    val cont = api.getRecords("s", "sh", first.records.last.sequenceNumber, 7)
    assert(cont.records.head.sequenceNumber == first.records.last.sequenceNumber + 1)
    assert(cont.records.map(_.data) == (8 to 14).map(i => s"d$i"))
  }

  test("takeover: a different worker resumes mid-stream through the shared bridge") {
    val (o, b) = fresh()
    val workerA = new OrdinalBridgedKinesis(o, b)
    val got = workerA.getRecords("s", "sh", 0L, 12)
    val checkpoint = got.records(8).sequenceNumber // min-uncompleted mid-batch
    // worker B: fresh api instance, SAME opaque log + SAME bridge store
    val workerB = new OrdinalBridgedKinesis(o, b)
    val resumed = workerB.getRecords("s", "sh", checkpoint, 100)
    assert(resumed.records.map(_.data) == (10 to 20).map(i => s"d$i"),
      "takeover must continue exactly after the checkpointed record")
    assert(resumed.records.head.sequenceNumber == checkpoint + 1)
  }

  test("resume from an unpublished ordinal fails loudly (never silently skips)") {
    val (o, b) = fresh()
    val api = new OrdinalBridgedKinesis(o, b)
    api.getRecords("s", "sh", 0L, 5) // bridge entries exist for 1..5 only
    val ex = intercept[IllegalStateException](api.getRecords("s", "sh", 9L, 5))
    assert(ex.getMessage.contains("no bridge entry"))
  }

  test("closed-shard drain: end ordinal observed on the drain read, MaxValue before") {
    val (o, b) = fresh()
    val api = new OrdinalBridgedKinesis(o, b)
    o.inner.splitShard("s", "sh", "sh-a", "sh-b")
    // closed but undrained: the gate must see an unreachable end
    assert(api.describeShards("s").find(_.shardId == "sh").get
      .endingSequence.contains(Long.MaxValue))
    val all = api.getRecords("s", "sh", 0L, 100)   // consumes all 20
    api.getRecords("s", "sh", all.records.last.sequenceNumber, 100) // drain read
    assert(api.describeShards("s").find(_.shardId == "sh").get
      .endingSequence.contains(20L), "observed end ordinal after drain")
    // children visible with the parent link, open
    val children = api.describeShards("s").filter(_.parents.contains("sh"))
    assert(children.map(_.shardId).toSet == Set("sh-a", "sh-b"))
    assert(children.forall(_.endingSequence.isEmpty))
  }

  test("opaque sequences are NOT the ordinals (the bridge is doing real translation)") {
    val (o, _) = fresh()
    val it = o.iteratorFor("s", "sh", None)
    val raw = o.getRecordsRaw(it, 3)
    assert(raw.records.map(_.sequence).forall(s => s.length == 24 && s.toLong > 1000000L))
  }
}
