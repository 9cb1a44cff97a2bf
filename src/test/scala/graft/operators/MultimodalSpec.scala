package graft.operators

import graft.SparkSpecBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mediaDf = {
    val rows = (1L to 20L).map { i =>
      val payload = Array.tabulate[Byte](100 + i.toInt)(j => ((i * 31 + j) % 251).toByte)
      Row(i, if (i % 3 == 0) "video" else "image", "application/octet-stream", payload,
        Row(640, 480, if (i % 3 == 0) 5000L else null, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.MediaSchema)
  }

  test("binary payloads round-trip the media schema through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    mediaDf.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    assert(back.count() == 20)
    val p = back.where(col("media_id") === 5).select("payload").head.getAs[Array[Byte]](0)
    assert(p.length == 105)
  }

  test("feature extraction is deterministic, batched, and fixed-width") {
    val feats = Multimodal.extractFeatures(mediaDf, dim = 16, batchSize = 4).collect()
    assert(feats.length == 20)
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3)) // normalized histogram
    assert(feats.filter(_.modality == "video").forall(_.frames == 8))
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(mediaDf, dim = 16, batchSize = 7).collect()
    assert(feats.sortBy(_.mediaId).zip(again.sortBy(_.mediaId))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frame sampling explodes videos into per-frame feature rows") {
    val frames = Multimodal.sampleFrames(mediaDf, frames = 4, dim = 16).collect()
    val videoIds = (1L to 20L).filter(_ % 3 == 0)
    assert(frames.map(_.mediaId).distinct.sorted.toSeq == videoIds)
    assert(frames.groupBy(_.mediaId).values.forall(_.length == 4))
    assert(frames.forall(_.features.length == 16))
    // deterministic per frame index
    val again = Multimodal.sampleFrames(mediaDf, frames = 4, dim = 16).collect()
    assert(frames.sortBy(f => (f.mediaId, f.frameIdx)).zip(again.sortBy(f => (f.mediaId, f.frameIdx)))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("resize stub scales payload size with target area") {
    val payload = Array.tabulate[Byte](1000)(_.toByte)
    val small = Multimodal.resizeStub(payload, 64, 64)
    val large = Multimodal.resizeStub(payload, 640, 480)
    assert(small.length < large.length)
    assert(Multimodal.resizeStub(payload, 64, 64).sameElements(small))
  }

  test("feature table feeds the similarity operators unchanged") {
    val ft = Multimodal.featureTable(mediaDf, dim = 16)
    assert(ft.columns.toSeq == Seq("vec_id", "embedding"))
    val a = ft.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = ft.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
    val sims = a.join(b, col("a_id") < col("b_id"))
      .select(VectorFunctions.cosineSim(col("a_v"), col("b_v")).as("cos"))
      .collect().map(_.getDouble(0))
    assert(sims.nonEmpty && sims.forall(c => c >= -1.0001 && c <= 1.0001))
  }
}
