package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A fixed-output codec: proves the seam carries the implementation, not
  * the plumbing. Top-level so the closure serializes without capturing
  * the spec instance. */
object ConstMediaCodec extends MediaCodec {
  override def decodeFeatures(payload: Array[Byte],
      featureDim: Int): Array[Float] = Array.fill(featureDim)(1.5f)
  override def scoreBatch(batch: Seq[Array[Byte]]): Seq[Double] =
    batch.map(_ => 0.25)
}

/** The [[MediaCodec]] seam: a drop-in codec changes the decoded values
  * and nothing else — schema, row count, and the stub path's outputs stay
  * identical, which is what "swap in a real decoder without touching the
  * pipeline" means. */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val payloads = Multimodal.attachFakePayload(
    Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"), (3L, "zeta"))
      .toDF("doc_id", "text"),
    "text")

  test("a custom codec drops into decodeFeatures without plumbing changes") {
    val out = Multimodal.decodeFeatures(payloads, 4, ConstMediaCodec)
    assert(out.schema.fieldNames.contains("features"))
    val feats = out.select($"features").collect()
      .map(_.getSeq[Float](0))
    assert(feats.length == 3 && feats.forall(_ == Seq(1.5f, 1.5f, 1.5f, 1.5f)))
  }

  test("a custom codec drops into scoreBatched; batching stays the harness's job") {
    val out = Multimodal.scoreBatched(payloads, batchSize = 2, ConstMediaCodec)
    assert(out.select($"score").collect().map(_.getDouble(0)).toSeq ==
      Seq(0.25, 0.25, 0.25))
  }

  test("the stub wrappers are exactly the seam applied to StubMediaCodec") {
    val viaSeam = Multimodal.decodeFeatures(payloads, 8, StubMediaCodec)
      .select($"doc_id", $"features").collect().map(_.toString).sorted.toSeq
    val viaStub = Multimodal.decodeFeaturesStub(payloads, 8)
      .select($"doc_id", $"features").collect().map(_.toString).sorted.toSeq
    assert(viaSeam == viaStub)
    val scoreSeam = Multimodal.scoreBatched(payloads, 32, StubMediaCodec)
      .select($"doc_id", $"score").collect().map(_.toString).sorted.toSeq
    val scoreStub = Multimodal.scoreBatchedStub(payloads)
      .select($"doc_id", $"score").collect().map(_.toString).sorted.toSeq
    assert(scoreSeam == scoreStub)
  }
}
