package graft.functions

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ImageCodec.{decode, encodeBmp, encodePgm, encodePpm, textRaster}
import graft.operators.{Multimodal, PixelMediaCodec}

/** The real image decoder, pinned three independent ways:
  *
  *  1. GOLDEN BYTES — hand-laid-out PPM/BMP files (not produced by our
  *     encoder) must decode to exactly the intended pixels, so an
  *     encoder/decoder bug pair can't cancel out.
  *  2. ROUND-TRIPS — encode→decode identity across formats, sign-bit
  *     sample values, and padded row strides.
  *  3. PIPELINE — the codegen'd expressions and [[PixelMediaCodec]]
  *     derive identical features from the same raster regardless of the
  *     carrying format (header/padding/flip/BGR all parsed away).
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  // ── 1. golden bytes ─────────────────────────────────────────────────────

  test("golden PPM with header comments decodes to exact pixels") {
    val header = "P6 # format magic comment\n# dims next\n2 2\n# maxval\n255\n"
    val raster = Array[Int](
      255, 0, 0, 0, 255, 0, // row 0: red, green
      0, 0, 255, 255, 255, 255 // row 1: blue, white
    ).map(_.toByte)
    val d = decode(header.getBytes(US_ASCII) ++ raster)
    assert(d.width == 2 && d.height == 2 && d.channels == 3)
    assert(d.pixels.toSeq == Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255))
  }

  test("golden P5 PGM decodes single-channel") {
    val bytes = "P5\n3 1\n255\n".getBytes(US_ASCII) ++
      Array[Byte](7, 130.toByte, 255.toByte)
    val d = decode(bytes)
    assert(d.width == 3 && d.height == 1 && d.channels == 1)
    assert(d.pixels.toSeq == Seq(7, 130, 255))
  }

  /** 2×2 24-bpp BMP laid out field by field: bottom-up rows, BGR samples,
    * rows padded 6 → 8 bytes. Intended top-down RGB image:
    * (red, green) / (blue, white). */
  private def goldenBmp(topDown: Boolean): Array[Byte] = {
    val out = new Array[Byte](54 + 16)
    def p32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, 54 + 16); p32(10, 54); p32(14, 40)
    p32(18, 2); p32(22, if (topDown) -2 else 2)
    out(26) = 1; out(28) = 24
    p32(30, 0); p32(34, 16)
    // each row: 2 px × BGR + 2 pad bytes
    val rowTop = Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)
    val rowBottom = Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0)
    val (first, second) = if (topDown) (rowTop, rowBottom) else (rowBottom, rowTop)
    System.arraycopy(first, 0, out, 54, 8)
    System.arraycopy(second, 0, out, 62, 8)
    out
  }

  private val goldenPixels =
    Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)

  test("golden bottom-up BMP decodes: flip undone, BGR→RGB, padding dropped") {
    val d = decode(goldenBmp(topDown = false))
    assert(d.width == 2 && d.height == 2 && d.channels == 3)
    assert(d.pixels.toSeq == goldenPixels)
  }

  test("golden top-down BMP (negative height) decodes to the same image") {
    assert(decode(goldenBmp(topDown = true)).pixels.toSeq == goldenPixels)
  }

  // ── 2. round-trips ──────────────────────────────────────────────────────

  private def raster(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 201) % 256).toByte) // crosses 127

  test("PPM round-trip, sign-bit samples intact") {
    val rgb = raster(5 * 3 * 3)
    val d = decode(encodePpm(5, 3, rgb))
    assert(d.width == 5 && d.height == 3)
    assert(d.pixels.toSeq == rgb.map(_ & 0xff).toSeq)
  }

  test("PGM round-trip") {
    val g = raster(4 * 2)
    assert(decode(encodePgm(4, 2, g)).pixels.toSeq == g.map(_ & 0xff).toSeq)
  }

  test("BMP round-trip across widths exercises every padding remainder") {
    for (w <- 1 to 5; h = 3) {
      val rgb = raster(w * h * 3)
      val enc = encodeBmp(w, h, rgb)
      assert(enc.length == 54 + ((w * 3 + 3) / 4) * 4 * h, s"w=$w size")
      val d = decode(enc)
      assert(d.width == w && d.height == h)
      assert(d.pixels.toSeq == rgb.map(_ & 0xff).toSeq, s"w=$w pixels")
    }
  }

  test("corrupt payloads fail loudly") {
    intercept[IllegalArgumentException](decode("XX".getBytes(US_ASCII)))
    intercept[IllegalArgumentException](
      decode("P6\n2 2\n255\n".getBytes(US_ASCII) ++ raster(5))) // truncated
    intercept[IllegalArgumentException](
      decode("P6\n2 2\n65535\n".getBytes(US_ASCII) ++ raster(24))) // 2-byte maxval
    val bpp8 = goldenBmp(topDown = false); bpp8(28) = 8
    intercept[IllegalArgumentException](decode(bpp8))
  }

  test("downsample2x floor-averages each 2x2 block per channel") {
    import graft.functions.ImageCodec.{downsample2x, DecodedImage}
    // gray 2×2: (1+2+3+4)/4 = 2 (floored from 2.5)
    val g = downsample2x(DecodedImage(2, 2, 1, Array(1, 2, 3, 4)))
    assert(g.width == 1 && g.height == 1 && g.pixels.toSeq == Seq(2))
    // RGB 4×2 → 2×1: channels pool independently; row stride honored
    val rgb = DecodedImage(4, 2, 3, Array(
      // row 0: (10,0,0) (20,0,0) (0,30,0) (0,40,0)
      10, 0, 0, 20, 0, 0, 0, 30, 0, 0, 40, 0,
      // row 1: (30,0,0) (40,0,0) (0,50,0) (0,60,0)
      30, 0, 0, 40, 0, 0, 0, 50, 0, 0, 60, 0))
    val d = downsample2x(rgb)
    assert(d.width == 2 && d.height == 1 && d.channels == 3)
    assert(d.pixels.toSeq == Seq(25, 0, 0, 0, 45, 0),
      s"block/channel pooling broken: ${d.pixels.toSeq}")
    // odd dims: trailing row/column dropped (floor semantics)
    val odd = downsample2x(DecodedImage(3, 3, 1,
      Array(1, 2, 9, 3, 4, 9, 9, 9, 9)))
    assert(odd.width == 1 && odd.height == 1 && odd.pixels.toSeq == Seq(2))
  }

  test("decodePixels column equals the raster the encoder laid down") {
    val rows = docs
      .withColumn("px", ImageExprs.decodePixels(
        ImageExprs.encodeImageFromText(col("text"), "bmp", 5, 2)))
      .select($"text", $"px").collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) ==
        textRaster(r.getString(0), 30).map(_ & 0xff).toSeq)
    }
  }

  test("textRaster is the codepoint fold the oracles replay") {
    assert(textRaster("AB", 5).toSeq == Seq[Byte](65, 66, 65, 66, 65))
    assert(textRaster("", 4).toSeq == Seq[Byte](0, 0, 0, 0))
  }

  // ── 3. pipeline: expressions + codec ────────────────────────────────────

  private lazy val docs =
    Seq((1L, "the quick brown fox"), (2L, "zebra"), (3L, "Data!")).toDF("doc_id", "text")

  test("imageStats over encoded payloads matches a direct Scala fold") {
    val rows = docs
      .withColumn("st", ImageExprs.imageStats(
        ImageExprs.encodeImageFromText(col("text"), "ppm", 4, 2)))
      .select($"text", $"st.sum_all", $"st.sum_c0", $"st.row0_sum",
        $"st.px_min", $"st.px_max", $"st.n_vals")
      .collect()
    rows.foreach { r =>
      val px = textRaster(r.getString(0), 4 * 2 * 3).map(_ & 0xff)
      assert(r.getLong(1) == px.map(_.toLong).sum)
      assert(r.getLong(2) == px.zipWithIndex.collect { case (v, i) if i % 3 == 0 => v.toLong }.sum)
      assert(r.getLong(3) == px.take(12).map(_.toLong).sum)
      assert(r.getInt(4) == px.min && r.getInt(5) == px.max)
      assert(r.getLong(6) == 24L)
    }
  }

  test("stats are carrier-format-independent: PPM and BMP agree on the raster") {
    def stats(fmt: String, w: Int, h: Int) = docs
      .withColumn("st", ImageExprs.imageStats(
        ImageExprs.encodeImageFromText(col("text"), fmt, w, h)))
      .select($"doc_id", $"st.sum_all", $"st.sum_c0", $"st.sum_c1",
        $"st.sum_c2", $"st.row0_sum")
      .collect().map(_.toString).sorted.toSeq
    assert(stats("ppm", 6, 4) == stats("bmp", 6, 4)) // width 6 → padded rows
  }

  test("PixelMediaCodec slots into the Multimodal plumbing over real payloads") {
    val payloads = Multimodal.attachImagePayload(docs, "text",
      width = 8, height = 8, format = "ppm")
    val feats = Multimodal.decodeFeatures(payloads, 8, PixelMediaCodec)
      .select($"text", $"features").collect()
    feats.foreach { r =>
      val px = textRaster(r.getString(0), 192).map(_ & 0xff)
      val sums = new Array[Long](8)
      px.zipWithIndex.foreach { case (v, i) => sums(i % 8) += v }
      assert(r.getSeq[Float](1) == sums.map(s => (s / 255.0).toFloat).toSeq)
    }
    val scores = Multimodal.scoreBatched(payloads, 2, PixelMediaCodec)
      .select($"text", $"score").collect()
    scores.foreach { r =>
      val total = textRaster(r.getString(0), 192).map(v => (v & 0xff).toLong).sum
      assert(r.getDouble(1) == (total % 997L) / 997.0)
    }
  }

  test("aHash bands: reference fold, perturbation locality, band coverage") {
    import graft.functions.ImageCodec.aHashBands
    def bands(text: String): Seq[Int] = {
      val payload = graft.functions.ImageCodec.encodeFromText(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), "pgm", 8, 8)
      aHashBands(payload).toIntArray().toSeq
    }
    // reference fold
    val t0 = "the quick brown fox jumps over the lazy dog repeatedly today"
    val px = textRaster(t0, 64).map(_ & 0xff)
    val mean = px.map(_.toLong).sum / 64
    val expect = (0 until 4).map { b =>
      (0 until 16).foldLeft(0) { (acc, j) =>
        if (px(16 * b + j) >= mean) acc | (1 << j) else acc
      }
    }
    assert(bands(t0) == expect)
    // near-dup: one character edit on a 60-char text perturbs ~2 of 64
    // samples; Hamming distance across bands stays small
    val t1 = t0.updated(5, 'q')
    val ham = bands(t0).zip(bands(t1))
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(ham <= 6, s"one-char edit moved $ham bits")
    // unrelated text lands far away
    val t2 = "completely different content with other words entirely here"
    val far = bands(t0).zip(bands(t2))
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(far > 6, s"unrelated images must not collide: $far bits")
  }

  test("encode + stats stay inside whole-stage codegen") {
    // a parquet-backed scan (local Seqs collapse to LocalTableScan, which
    // never codegens regardless of the expressions above it)
    val plan = graft.Tables.load(spark, sf, "documents")
      .withColumn("st", ImageExprs.imageStats(
        ImageExprs.encodeImageFromText(col("text"), "ppm", 4, 2)))
      .select($"doc_id", $"st.sum_all")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes a WholeStageCodegen span in the simple plan string
    assert(plan.contains("*(1) Project"), plan)
  }
}
