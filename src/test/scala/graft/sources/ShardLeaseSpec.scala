package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Election scenarios mirroring the reference's Kinesis shard-lease
  * tests (`/root/reference/motorway/tests/test_amazon_kinesis.py:56-188`):
  * stale-owner takeover, heartbeat liveness, rebalancing at 3 workers /
  * 10 shards, checkpoint transfer on claim, claim races. */
class ShardLeaseSpec extends AnyFunSuite {

  private def seed(table: InMemoryLeaseTable, owners: (String, String)*): Unit =
    owners.foreach { case (shard, worker) =>
      table.force(ShardLease(shard, checkpoint = 0L, workerId = worker, heartbeat = 0L))
    }

  test("stale owner (no heartbeat during timeout) is claimable") {
    val t = new InMemoryLeaseTable
    seed(t, "shard-1" -> "w0", "shard-2" -> "w1")
    val c = new ShardLeaseCoordinator("me", t)
    assert(c.canClaimShard("shard-1"))
    assert(c.canClaimShard("shard-2"))
  }

  test("live owner (heartbeat advances during timeout) is not claimable") {
    val t = new InMemoryLeaseTable
    seed(t, "shard-1" -> "w0")
    val c = new ShardLeaseCoordinator("me", t, onWait = () => {
      val l = t.get("shard-1").get
      t.force(l.copy(heartbeat = l.heartbeat + 1))
    })
    assert(!c.canClaimShard("shard-1"))
  }

  test("live but overloaded owner loses a shard to an idle worker (rebalance)") {
    val t = new InMemoryLeaseTable
    seed(t, "shard-1" -> "w0", "shard-2" -> "w0")
    val c = new ShardLeaseCoordinator("me", t, onWait = () => {
      val l = t.get("shard-1").get
      t.force(l.copy(heartbeat = l.heartbeat + 1, checkpoint = 1337L))
    })
    assert(c.canClaimShard("shard-1"))
  }

  test("claim CAS succeeds and transfers ownership") {
    val t = new InMemoryLeaseTable
    seed(t, "shard-1" -> "w0", "shard-2" -> "w0")
    val c = new ShardLeaseCoordinator("me", t)
    assert(c.claimShard("shard-1"))
    assert(t.get("shard-1").get.workerId == "me")
    assert(t.get("shard-1").get.heartbeat == 0L)
  }

  test("claim carries over an externally updated checkpoint (checkpoint transfer)") {
    val t = new InMemoryLeaseTable
    seed(t, "shard-1" -> "w0", "shard-2" -> "w0")
    val a = new ShardLeaseCoordinator("worker-a", t)
    val b = new ShardLeaseCoordinator("worker-b", t)
    assert(a.claimShard("shard-1"))
    assert(a.claimShard("shard-2"))
    // previous owner checkpointed progress before dying
    t.force(t.get("shard-1").get.copy(checkpoint = 1337L))
    assert(b.claimShard("shard-1"))
    val l = t.get("shard-1").get
    assert(l.workerId == "worker-b")
    assert(l.checkpoint == 1337L)
  }

  test("claim fails when the checkpoint moves between read and write (race)") {
    val t = new InMemoryLeaseTable
    seed(t, "shard-1" -> "w0")
    // model the reference's get-then-conditional-put race: the record's
    // checkpoint changes after our read but before our write
    val rec = t.get("shard-1").get
    t.force(rec.copy(checkpoint = 42L))
    assert(!t.putIf(rec.copy(workerId = "me", heartbeat = 0L))(_.checkpoint == rec.checkpoint))
    assert(t.get("shard-1").get.workerId == "w0")
  }

  test("concurrent claims: exactly one coordinator wins each shard") {
    val t = new InMemoryLeaseTable
    seed(t, (1 to 8).map(i => s"shard-$i" -> "dead"): _*)
    val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val coords = (1 to 6).map(i => new ShardLeaseCoordinator(s"w$i", t))
    val threads = for (c <- coords; s <- 1 to 8) yield new Thread(() => {
      // claim is a read + CAS on checkpoint; bump the checkpoint on
      // success so every later claim of the same shard CAS-fails
      val rec = t.get(s"shard-$s").get
      if (t.putIf(rec.copy(workerId = c.workerId, heartbeat = 0L, checkpoint = rec.checkpoint + 1))(
          old => old.checkpoint == rec.checkpoint && old.workerId == "dead"))
        winners.add(s"shard-$s:${c.workerId}")
    })
    threads.foreach(_.start()); threads.foreach(_.join())
    val byShard = winners.toArray.map(_.toString.split(":")(0)).groupBy(identity)
    assert(byShard.size == 8)
    assert(byShard.values.forall(_.length == 1), "a shard was claimed twice")
  }

  test("3 workers / 10 shards: idle-capacity worker claims from the overloaded one, then no further steal") {
    val t = new InMemoryLeaseTable
    val Seq(w1, w2, w3) = Seq("w1", "w2", "w3")
    // w1: shards 1-3, w2: shards 4-6, w3: shards 7-10 (3/3/4)
    seed(t, (1 to 10).map { i =>
      s"shard-$i" -> (if (i <= 3) w1 else if (i <= 6) w2 else w3)
    }: _*)
    // shard-10's owner never heartbeats; everyone else does
    def beatAllBut10(): Unit = (1 to 9).foreach { i =>
      val l = t.get(s"shard-$i").get
      t.force(l.copy(heartbeat = l.heartbeat + 1))
    }
    val c1 = new ShardLeaseCoordinator(w1, t, onWait = () => beatAllBut10())
    assert(c1.canClaimShard("shard-10")) // stale owner on shard-10
    assert(c1.claimShard("shard-10"))    // now 4/3/3
    // all shards heartbeat: distribution 4/3/3 is within ⌊10/3⌋ = 3 for
    // the claimer, so no worker may steal shard-10 for balance
    def beatAll(): Unit = (1 to 10).foreach { i =>
      val l = t.get(s"shard-$i").get
      t.force(l.copy(heartbeat = l.heartbeat + 1))
    }
    val c2 = new ShardLeaseCoordinator(w2, t, onWait = () => beatAll())
    assert(!c2.canClaimShard("shard-10"))
  }

  test("no control record raises NoLeaseRecord; first claim registers it") {
    val t = new InMemoryLeaseTable
    val c = new ShardLeaseCoordinator("me", t)
    assertThrows[NoLeaseRecord](c.canClaimShard("shard-1"))
    assert(c.claimNewShard("shard-1"))
    assert(!c.claimNewShard("shard-1")) // second insert loses
    assert(t.get("shard-1").get.workerId == "me")
  }

  test("heartbeat publishes progress and detects lost ownership") {
    val t = new InMemoryLeaseTable
    seed(t, "shard-1" -> "me")
    val c = new ShardLeaseCoordinator("me", t)
    assert(c.heartbeat("shard-1", newCheckpoint = 7L))
    val l = t.get("shard-1").get
    assert(l.heartbeat == 1L && l.checkpoint == 7L)
    t.force(l.copy(workerId = "thief"))
    assert(!c.heartbeat("shard-1", newCheckpoint = 9L))
  }
}
