package graft.functions

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VideoCodec.{decodeY4m, encodeY4m, textFrames}

/** The Y4M decoder pinned like the image/audio decoders: golden bytes
  * with adversarial headers (reordered tags, unknown X tag, omitted C
  * tag → 420 default, FRAME lines carrying their own parameters),
  * round-trips, loud failures, and the expressions against direct
  * folds. */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built 2×2 C420 stream, one frame: header tags REORDERED with
    * an unknown X tag; the FRAME line carries a parameter. Planes:
    * Y = 10,20,30,40; Cb = 5; Cr = 250. */
  private val golden: Array[Byte] =
    "YUV4MPEG2 H2 Xsome=thing W2 F30:1 C420jpeg Ip\nFRAME Itag\n"
      .getBytes(US_ASCII) ++
      Array[Byte](10, 20, 30, 40, 5, 250.toByte)

  test("golden Y4M: reordered tags, unknown X, FRAME params all parse") {
    val d = decodeY4m(golden)
    assert(d.width == 2 && d.height == 2)
    assert(d.fpsNum == 30 && d.fpsDen == 1)
    assert(d.frames.length == 1)
    assert(d.frames(0).toSeq == Seq(10, 20, 30, 40, 5, 250))
  }

  test("C420 is the default when the C tag is absent") {
    val noC = "YUV4MPEG2 W2 H2 F25:1\nFRAME\n".getBytes(US_ASCII) ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val d = decodeY4m(noC)
    assert(d.frames(0).toSeq == Seq(1, 2, 3, 4, 5, 6))
  }

  test("encode→decode round-trip over multiple frames") {
    val frames = (0 until 3).map(f =>
      Array.tabulate(96)(i => ((f * 100 + i * 7) % 256).toByte))
    val d = decodeY4m(encodeY4m(8, 8, 25, 1, frames))
    assert(d.frames.length == 3)
    (0 until 3).foreach(f =>
      assert(d.frames(f).toSeq == frames(f).map(_ & 0xff).toSeq, s"frame $f"))
  }

  test("corrupt video fails loudly") {
    intercept[IllegalArgumentException](decodeY4m("JUNKMPEG2 W2 H2\n".getBytes(US_ASCII)))
    intercept[IllegalArgumentException]( // 4:2:2 chroma unsupported
      decodeY4m(("YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\n".getBytes(US_ASCII) ++
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))))
    intercept[IllegalArgumentException]( // truncated frame
      decodeY4m("YUV4MPEG2 W2 H2 F25:1\nFRAME\n".getBytes(US_ASCII) ++
        Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException]( // odd dims
      decodeY4m("YUV4MPEG2 W3 H2 F25:1\nFRAME\n".getBytes(US_ASCII) ++
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)))
  }

  test("videoStats + frameYSums match direct folds over textFrames") {
    val docs = Seq((1L, "video alpha"), (2L, "Zz"), (3L, "frames 123"))
      .toDF("doc_id", "text")
    val rows = docs
      .withColumn("payload",
        VideoExprs.encodeY4mFromText(col("text"), 8, 8, 4, omitC = false))
      .select($"text", VideoExprs.videoStats($"payload").as("st"),
        VideoExprs.frameYSums($"payload").as("fs"))
      .select($"text", $"st.n_frames", $"st.y_sum_all", $"st.y_sum_f0",
        $"st.uv_sum", $"fs")
      .collect()
    rows.foreach { r =>
      val frames = textFrames(r.getString(0), 8, 8, 4).map(_.map(_ & 0xff))
      val ySums = frames.map(_.take(64).map(_.toLong).sum)
      assert(r.getInt(1) == 4)
      assert(r.getLong(2) == ySums.sum)
      assert(r.getLong(3) == ySums.head)
      assert(r.getLong(4) == frames.map(_.drop(64).map(_.toLong).sum).sum)
      assert(r.getSeq[Long](5) == ySums.toSeq)
    }
  }

  test("frameYDeltas: MAFD of hand-built frames; static scene reads zero") {
    // frame0 Y = 0..3, frame1 Y = 10,18,33,44 → Σ|Δ| = 10+17+31+41 = 99;
    // frame2 repeats frame1 → delta 0 (chroma changes must NOT count)
    val f0 = Array.tabulate(6)(i => i.toByte)
    val f1 = Array[Byte](10, 19, 35, 47, 99, 99)
    val f2 = Array[Byte](10, 19, 35, 47, 1, 2)
    val enc = encodeY4m(2, 2, 25, 1, Seq(f0, f1, f2))
    val got = VideoCodec.frameYDeltas(enc)
    assert(got.toLongArray().toSeq ==
      Seq((10 - 0) + (19 - 1) + (35 - 2) + (47 - 3), 0L))
  }

  test("frameYDeltas matches a direct fold over text fixtures") {
    val rows = Seq("abcdefgh", "scene cut material", "xy")
      .toDF("text")
      .withColumn("payload",
        VideoExprs.encodeY4mFromText($"text", 8, 8, 4, omitC = false))
      .select($"text", VideoExprs.frameYDeltas($"payload").as("ds"))
      .collect()
    rows.foreach { r =>
      val frames = textFrames(r.getString(0), 8, 8, 4).map(_.map(_ & 0xff))
      val want = (1 until 4).map(f =>
        (0 until 64).map(i =>
          math.abs(frames(f)(i) - frames(f - 1)(i)).toLong).sum)
      assert(r.getSeq[Long](1) == want)
    }
  }
}
