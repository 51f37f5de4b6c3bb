package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `BinaryType`
  * payloads with a typed metadata struct, and a partition-wise
  * decode/feature-extract stage.
  *
  * The Spark-side machinery here is real and tested — schema, partition
  * batching, deterministic output shape. The *decoder itself is a STUB*:
  * this container has no image/audio codecs, so `decodeFeaturesStub`
  * derives a deterministic fake feature vector from the payload bytes.
  * Swapping in a real decoder (JNI codec, ONNX runtime, …) changes only
  * the marked function body — the distributed plumbing is unchanged.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width_px", IntegerType, nullable = false),
    StructField("height_px", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Wrap a text column as a fake media payload: `payload` (binary) +
    * `media` (typed metadata). Stands in for reading real image bytes from
    * a binary-file source (`spark.read.format("binaryFile")` at scale). */
  def attachFakePayload(df: DataFrame, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8").cast(BinaryType)
    val h = abs(xxhash64(col(textCol)))
    df.withColumn("payload", payload)
      .withColumn("media", struct(
        lit("image").as("kind"),
        (h % 1920 + 16).cast(IntegerType).as("width_px"),
        (h % 1080 + 16).cast(IntegerType).as("height_px"),
        length(col(textCol)).cast(LongType).as("n_bytes")))
  }

  /** Partition-wise decode + feature extraction over binary payloads
    * (the `mapPartitions` shape a real decoder needs: per-partition codec
    * init, batched row iteration — the Scala analog of `mapInPandas`).
    *
    * ==== STUB ====
    * A real implementation would decode `payload` with an image library
    * and run a feature extractor. Unavailable in this container, so the
    * "features" are a deterministic fold of the payload bytes with the
    * declared dimensionality and batch shape of the real thing.
    */
  def decodeFeaturesStub(df: DataFrame, featureDim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition init would open the codec here (once, not per row)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        // accumulate exactly in Long, divide once: the result is then
        // independent of accumulation order (a float += per byte is not),
        // so external engines can recompute it for verification
        val sums = new Array[Long](featureDim)
        var i = 0
        while (i < bytes.length) {
          sums(i % featureDim) += bytes(i) & 0xff
          i += 1
        }
        val feats = sums.map(s => (s / 255.0).toFloat)
        Row.fromSeq(row.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Deterministic frame-sampling plan for video-like payloads: selects
    * every `stride`-th frame index below `nFrames` — the bookkeeping a
    * frame-sampling decode stage needs, without the codec. */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: String,
      stride: Int): DataFrame =
    df.withColumn("frame_idx",
      sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride)))

  /** Resize plan for image-like payloads: target dimensions that fit
    * `maxEdgePx` preserving aspect ratio (never upscaled). Pure column
    * math over the metadata struct — the actual pixel transform is the
    * decode stage's job (STUB, like [[decodeFeaturesStub]]); this computes
    * the batch-wide geometry a resize kernel consumes. */
  def resizePlan(df: DataFrame, maxEdgePx: Int): DataFrame = {
    val w = col("media.width_px").cast(DoubleType)
    val h = col("media.height_px").cast(DoubleType)
    val scale = least(lit(1.0), lit(maxEdgePx.toDouble) / greatest(w, h))
    df.withColumn("resize", struct(
      round(w * scale).cast(IntegerType).as("out_w"),
      round(h * scale).cast(IntegerType).as("out_h"),
      round(scale, 6).as("scale")))
  }

  /** Batched model scoring over binary payloads — the Scala analog of
    * `mapInPandas` batch semantics: rows stream through each partition in
    * `batchSize` groups, the "model" is invoked once per batch (where a
    * real deployment amortizes tensor transfer / session overhead), and
    * scores come back row-aligned.
    *
    * ==== STUB ====
    * The per-batch model call is a deterministic per-row byte fold (so the
    * result is engine-recomputable and independent of batch boundaries);
    * a real ONNX/Triton client replaces only `runModelBatch`.
    */
  def scoreBatchedStub(df: DataFrame, batchSize: Int = 32): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val outSchema = StructType(df.schema.fields :+
      StructField("score", DoubleType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    def runModelBatch(batch: Seq[Array[Byte]]): Seq[Double] =
      // STUB model: per-row fold over the decoded text's Unicode
      // codepoints, deliberately batch-shape-independent. Codepoints (not
      // raw UTF-8 bytes) keep the value recomputable by a SQL-side
      // ord(substr(...)) oracle for any text — the same portability rule
      // as polyHash/RollingMinHash.
      batch.map { bytes =>
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .codePoints().asLongStream().sum()
        (s % 997L) / 997.0
      }
    df.mapPartitions { rows =>
      // per-partition init would create the model session here (once)
      rows.grouped(batchSize).flatMap { batch =>
        val scores = runModelBatch(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.lazyZip(scores).map { (row, sc) => Row.fromSeq(row.toSeq :+ sc) }
      }
    }(enc)
  }
}
