package graft.functions

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.AudioCodec.{decodeWav, encodeWav, textSamples}

/** The WAV decoder pinned like the image decoder: golden bytes laid out
  * by hand (chunk stream with a junk chunk and an odd-sized chunk whose
  * pad byte must be skipped), round-trips across the signed range, loud
  * failures, and the codegen'd expression against a direct Scala fold.
  */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built WAV: RIFF → fmt (PCM mono 16-bit, 8000 Hz) → a 3-byte
    * junk chunk "odd" (decoder must skip its pad byte) → data with
    * samples (1000, -1000, 32767, -32768). */
  private def goldenWav: Array[Byte] = {
    val samples = Seq(1000, -1000, 32767, -32768)
    val data = samples.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    val out = new java.io.ByteArrayOutputStream()
    def str(s: String): Unit = out.write(s.getBytes(US_ASCII))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16(v >>> 16) }
    str("RIFF"); u32(4 + 24 + (8 + 3 + 1) + (8 + data.length)); str("WAVE")
    str("fmt "); u32(16); u16(1); u16(1); u32(8000); u32(16000); u16(2); u16(16)
    str("odd "); u32(3); out.write(Array[Byte](9, 9, 9)); out.write(0) // pad
    str("data"); u32(data.length); out.write(data.toArray)
    out.toByteArray
  }

  test("golden WAV: chunk walk skips junk + pad, samples decode signed LE") {
    val d = decodeWav(goldenWav)
    assert(d.sampleRate == 8000)
    assert(d.samples.toSeq == Seq(1000, -1000, 32767, -32768))
  }

  test("encode→decode round-trip across the signed range") {
    val s = Array.tabulate(200)(i => ((i * 997) % 65536 - 32768).toShort)
    val d = decodeWav(encodeWav(44100, s))
    assert(d.sampleRate == 44100)
    assert(d.samples.toSeq == s.map(_.toInt).toSeq)
  }

  test("corrupt audio fails loudly") {
    intercept[IllegalArgumentException](decodeWav("RIFX1234WAVE".getBytes(US_ASCII)))
    // stereo rejected
    val stereo = encodeWav(8000, Array[Short](1, 2))
    stereo(22) = 2 // channels = 2
    intercept[IllegalArgumentException](decodeWav(stereo))
    // 8-bit rejected
    val bits8 = encodeWav(8000, Array[Short](1, 2))
    bits8(34) = 8
    intercept[IllegalArgumentException](decodeWav(bits8))
    // truncated data chunk rejected
    intercept[IllegalArgumentException](
      decodeWav(encodeWav(8000, Array[Short](1, 2, 3)).dropRight(2)))
  }

  test("textSamples is the formula the oracles replay") {
    assert(textSamples("A", 2).toSeq ==
      Seq(((65 * 257) % 65536 - 32768).toShort, ((65 * 257) % 65536 - 32768).toShort))
    assert(textSamples("", 1).toSeq == Seq((-32768).toShort))
  }

  test("audioStats expression matches a direct Scala fold") {
    val docs = Seq((1L, "alpha beta"), (2L, "Zz"), (3L, "mixed CASE 42"))
      .toDF("doc_id", "text")
    val rows = docs
      .withColumn("st", AudioExprs.audioStats(
        AudioExprs.encodeWavFromText(col("text"), 16000, 64)))
      .select($"text", $"st.sum_abs", $"st.energy", $"st.zero_crossings",
        $"st.s_min", $"st.s_max", $"st.n_samples", $"st.sample_rate")
      .collect()
    rows.foreach { r =>
      val s = textSamples(r.getString(0), 64).map(_.toInt)
      assert(r.getLong(1) == s.map(v => math.abs(v).toLong).sum)
      assert(r.getLong(2) == s.map(v => v.toLong * v).sum)
      assert(r.getLong(3) == s.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)))
      assert(r.getInt(4) == s.min && r.getInt(5) == s.max)
      assert(r.getLong(6) == 64L && r.getInt(7) == 16000)
    }
  }

  test("µ-law: golden anchors from the public G.711 tables") {
    import AudioCodec.{mulawDecode, mulawEncode}
    // the published fixed points: +0 → 0xFF, −0 → 0x7F, max magnitude
    // decodes to ±32124 (encoded 0x80 / 0x00 after wire inversion)
    assert(mulawEncode(0) == 0xff)
    assert(mulawDecode(0xff) == 0)
    assert(mulawDecode(0x7f) == 0)
    assert(mulawDecode(0x80) == 32124)
    assert(mulawDecode(0x00) == -32124)
    assert(mulawEncode(32635) == 0x80)
    assert(mulawEncode(-32635) == 0x00)
    assert(mulawEncode(32767) == 0x80) // clamp region
  }

  test("µ-law: exhaustive 16-bit sweep — error bound and code idempotence") {
    import AudioCodec.{mulawDecode, mulawEncode}
    // decode∘encode error ≤ half the top-segment step (512), plus the
    // clamp region's up-to-644 at |x| > 32635
    var worst = 0
    var x = -32768
    while (x <= 32767) {
      val err = math.abs(mulawDecode(mulawEncode(x)) - x)
      if (err > worst) worst = err
      x += 1
    }
    assert(worst == 644, s"worst error $worst") // −32768 → −32124
    // encode(decode(u)) == u for every code except −0 (0x7F), which
    // collapses onto +0 per the standard
    for (u <- 0 until 256 if u != 0x7f)
      assert(mulawEncode(mulawDecode(u)) == u, f"code 0x$u%02x")
  }

  test("µ-law WAV round-trips through the generic decode path") {
    import AudioCodec._
    val samples = Array.tabulate(300)(i => ((i * 997) % 65536 - 32768).toShort)
    val dec = decodeWav(encodeWavMulaw(8000, samples))
    assert(dec.sampleRate == 8000 && dec.samples.length == 300)
    for (i <- samples.indices)
      assert(dec.samples(i) == mulawDecode(mulawEncode(samples(i))), s"at $i")
  }

  test("tryImageStats absorbs poison pills as NULL, keeps good rows") {
    val docs = Seq((1L, "good doc"), (7L, "truncated")).toDF("doc_id", "text")
    val out = docs
      .withColumn("payload",
        ImageExprs.encodeImageFromText(col("text"), "pgm", 4, 4))
      .withColumn("payload",
        when($"doc_id" === 7L, expr("substring(payload, 1, 6)"))
          .otherwise($"payload"))
      .withColumn("st", ImageExprs.tryImageStats($"payload"))
      .select($"doc_id", $"st").collect()
    val byId = out.map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId == Map(1L -> false, 7L -> true))
  }
}
