package graft.streaming

import graft.SparkSpecBase
import graft.operators.MediaFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamingMediaGate.{MediaRecord, MediaVerdict}

/** The live media gate must agree with the BATCH gates class-by-class
  * (q200's image ladder, q203's audio ladder — same parsers, same
  * thresholds), keep a correct running census per (source, modality),
  * and fence redeliveries. */
class StreamingMediaGateSpec extends SparkSpecBase {
  import spark.implicits._

  /** The fixture corpus as an ingest stream: every image-class doc's
    * q193/q200 payload plus every doc's q203 PCM WAV. */
  private def mediaStream(): Array[MediaRecord] = {
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().sortBy(_._1)
    val images = ids.filter(_._1 % 4 != 3).map { case (id, src) =>
      MediaRecord(id, src, "image", MediaFixture.payload(id), id * 2)
    }
    val audio = ids.map { case (id, src) =>
      MediaRecord(id, src, "audio", MediaFixture.pcmWav(id), id * 2 + 1)
    }
    (images ++ audio).sortBy(_.seq)
  }

  test("gate verdicts reproduce the batch q200/q203 censuses class by class") {
    val recs = mediaStream()
    val chunks = recs.grouped(math.max(recs.length / 3, 1)).toSeq
    val input = MemoryStream[MediaRecord](spark, 4)
    val q = StreamingMediaGate.verdicts(input.toDS())
      .writeStream.format("memory").queryName("media_gate_out")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val got = spark.table("media_gate_out").as[MediaVerdict].collect()
      assert(got.length == recs.length)
      assert(!got.exists(_.redelivered), "clean delivery: nothing fenced")
      // image class census == the registered batch q200 bill
      val gotImg = got.filter(_.modality == "image")
        .groupBy(v => (v.source, v.verdict)).view.mapValues(_.length.toLong).toMap
      val wantImg = graft.queries.Media.q200.run(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(gotImg == wantImg, "image gate must equal the q200 census")
      // audio class census == the registered batch q203 bill
      val gotAud = got.filter(_.modality == "audio")
        .groupBy(v => (v.source, v.verdict)).view.mapValues(_.length.toLong).toMap
      val wantAud = graft.queries.Media2.q203.run(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(gotAud == wantAud, "audio gate must equal the q203 census")
      // running census: final counters per key == recount
      got.groupBy(v => (v.source, v.modality)).foreach { case (k, vs) =>
        val last = vs.maxBy(_.seq)
        assert(last.nSeen == vs.length.toLong, s"$k nSeen")
        assert(last.nDropped == vs.count(_.verdict != "ok").toLong, s"$k nDropped")
      }
      // the fixture exercises every ladder rung
      assert(got.map(_.verdict).toSet ==
        Set("rejected", "too_small", "extreme_aspect", "ok", "clipped"))
    } finally q.stop()
  }

  test("unknown modalities route to 'unroutable', never to the image ladder") {
    // r15 ADVICE: a manifest typo must surface as a routing problem in
    // the census — before the fix it fell to the image ladder and read
    // as 'rejected'; a declared video runs the real q206 ladder
    val recs = Array(
      MediaRecord(1L, "s1", "video", MediaFixture.aviPayload(1L), 1L),
      MediaRecord(2L, "s1", "vdieo", MediaFixture.payload(2L), 2L), // typo
      MediaRecord(3L, "s1", "image", MediaFixture.payload(4L), 3L))
    val input = MemoryStream[MediaRecord](spark, 4)
    val q = StreamingMediaGate.verdicts(input.toDS())
      .writeStream.format("memory").queryName("media_gate_route")
      .outputMode("append").start()
    try {
      input.addData(recs); q.processAllAvailable()
      val got = spark.table("media_gate_route").as[MediaVerdict].collect()
      val byId = got.map(v => v.docId -> v.verdict).toMap
      assert(byId(2L) == "unroutable")
      assert(Set("too_short", "high_motion", "ok", "rejected")(byId(1L)),
        "a declared video runs the q206 ladder, never 'unroutable'")
      assert(byId(3L) != "unroutable", "a declared image still runs the image ladder")
      // unroutable counts as dropped in its (source, modality) census
      val typo = got.find(_.docId == 2L).get
      assert(typo.nDropped == 1L && typo.nSeen == 1L)
    } finally q.stop()
  }

  test("video gate verdicts reproduce the batch q206 census class by class") {
    import graft.SparkEntry
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().sortBy(_._1)
    val recs = ids.map { case (id, src) =>
      MediaRecord(id, src, "video", MediaFixture.aviPayload(id), id)
    }
    val input = MemoryStream[MediaRecord](spark, 4)
    val q = StreamingMediaGate.verdicts(input.toDS())
      .writeStream.format("memory").queryName("media_gate_video")
      .outputMode("append").start()
    try {
      input.addData(recs); q.processAllAvailable()
      val got = spark.table("media_gate_video").as[MediaVerdict].collect()
        .groupBy(v => (v.source, v.verdict)).view.mapValues(_.length.toLong).toMap
      val want = SparkEntry.queries("q206_video_gate_census")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, "video gate must equal the q206 census")
      assert(got.keys.map(_._2).toSet ==
        Set("rejected", "too_short", "high_motion", "ok"))
    } finally q.stop()
  }

  test("redelivery fence: replays re-emit the verdict, never re-count") {
    val recs = mediaStream().take(10)
    val fenced = spark.sparkContext.longAccumulator("media_fenced")
    val input = MemoryStream[MediaRecord](spark, 4)
    val q = StreamingMediaGate.verdicts(input.toDS(), Some(fenced))
      .writeStream.format("memory").queryName("media_gate_replay")
      .outputMode("append").start()
    try {
      input.addData(recs); q.processAllAvailable()
      input.addData(recs.take(4)); q.processAllAvailable() // replay
      val got = spark.table("media_gate_replay").as[MediaVerdict].collect()
      val (replayed, first) = got.partition(_.redelivered)
      assert(first.length == recs.length && replayed.length == 4)
      assert(fenced.value == 4L)
      // replays carry the ORIGINAL deterministic verdict (keyed by
      // (docId, modality) — each doc ships both an image and an audio
      // payload)
      val orig = first.map(v => (v.docId, v.modality) -> v.verdict).toMap
      replayed.foreach(v => assert(v.verdict == orig((v.docId, v.modality))))
      // census untouched by the replay
      got.groupBy(v => (v.source, v.modality)).foreach { case (k, vs) =>
        val lastSeen = vs.maxBy(_.seq).nSeen
        assert(lastSeen == vs.count(!_.redelivered).toLong, s"$k recounted")
      }
    } finally q.stop()
  }
}
