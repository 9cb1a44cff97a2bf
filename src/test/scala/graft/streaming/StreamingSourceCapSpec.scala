package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The live admission gate must admit exactly `cap` documents per
  * source — the first arrivals in stream order (doc_id-deterministic
  * within a batch) — and keep counting across micro-batches. */
class StreamingSourceCapSpec extends SparkSpecBase {
  import spark.implicits._

  test("admits the first cap arrivals per source across micro-batches; verdicts for all") {
    val Cap = 100
    val rows = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val input = MemoryStream[(Long, String)](spark, 4)
    val q = StreamingSourceCap.admissions(input.toDS(), Cap)
      .writeStream.format("memory").queryName("cap_out")
      .outputMode("append").start()
    try {
      val chunks = rows.grouped(math.max(rows.size / 3, 1)).toSeq
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val got = spark.table("cap_out")
        .as[(Long, String, Boolean, Long)].collect().toSeq
      assert(got.size == rows.size, "every document needs a verdict row")
      // exactly min(cap, n) admitted per source
      val bySource = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val admitted = got.filter(_._3).groupBy(_._2).view.mapValues(_.size).toMap
      bySource.foreach { case (src, n) =>
        assert(admitted.getOrElse(src, 0) == math.min(Cap, n),
          s"$src admitted ${admitted.getOrElse(src, 0)} of $n under cap $Cap")
      }
      // the admitted set is the FIRST cap in (batch, doc_id) order:
      // replay the gate driver-side over the same chunking
      val counts = scala.collection.mutable.Map.empty[String, Int]
      val expectAdmitted = chunks.flatten.flatMap { case (id, src) =>
        val n = counts.getOrElse(src, 0)
        if (n < Cap) { counts(src) = n + 1; Some(id) } else None
      }.toSet
      assert(got.filter(_._3).map(_._1).toSet == expectAdmitted,
        "admission order must be first-arrivals, doc_id-deterministic per batch")
      // rejects carry the saturated counter (audit surface)
      got.filterNot(_._3).foreach { case (_, src, _, n) =>
        assert(n == math.min(Cap, bySource(src)), s"$src reject row counter wrong: $n")
      }
    } finally q.stop()
  }
}
