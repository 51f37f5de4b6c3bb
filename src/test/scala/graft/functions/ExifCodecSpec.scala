package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Invariants for the EXIF plane: APP1 layout (preamble NULs, TIFF-
  * relative offsets), extraction round trip, coexistence with the pixel
  * decoder, the no-APP1 path, and loud rejection of non-JPEG bytes. */
class ExifCodecSpec extends AnyFunSuite {

  test("round trip: planted Make/Orientation/DateTime come back exactly") {
    for (id <- Seq(0L, 1L, 7L, 12345L)) {
      val payload = ExifCodec.encodeFromText(
        UTF8String.fromString("exif fixture text"), id, 4, 4, 50)
      val info = ExifCodec.extract(payload)
      assert(info.orientation === ExifCodec.plantedOrientation(id))
      assert(info.make === ExifCodec.plantedMake(id))
      assert(info.dateTime === ExifCodec.plantedDateTime(id))
      assert(info.dateTime.length === 19)
      assert(info.app1Bytes === 90) // fixed layout: 2 len + 6 preamble + 82
      assert(info.nSegments === 7) // APP1 + APP0/DQT/SOF0/DHT/DHT/SOS
    }
  }

  test("the preamble carries real NUL bytes, not spaces") {
    val body = ExifCodec.buildApp1Body("m", 1, "2020:01:01 00:00:00")
    assert(body.slice(0, 6).toSeq ===
      Seq[Byte]('E', 'x', 'i', 'f', 0, 0))
    // TIFF header directly after
    assert(body(6) === 'I'.toByte && body(7) === 'I'.toByte)
  }

  test("the pixel decoder skips the APP1 segment untripped") {
    val text = UTF8String.fromString("skip me")
    val plain = JpegCodec.encodeGrayBlocksJpeg(text, 4, 4, 50)
    val withExif = ExifCodec.encodeFromText(text, 42L, 4, 4, 50)
    val a = JpegCodec.decodeJpeg(plain)
    val b = JpegCodec.decodeJpeg(withExif)
    assert(a.width === b.width && a.height === b.height)
    assert(a.pixels.toSeq === b.pixels.toSeq)
  }

  test("a JPEG without APP1 reports absent metadata, not an error") {
    val plain = JpegCodec.encodeGrayBlocksJpeg(
      UTF8String.fromString("no exif"), 4, 4, 50)
    val info = ExifCodec.extract(plain)
    assert(info.orientation === -1 && info.make === "" &&
      info.dateTime === "" && info.app1Bytes === 0)
    assert(info.nSegments === 6)
  }

  test("non-JPEG bytes are rejected loudly") {
    val e = intercept[IllegalArgumentException](
      ExifCodec.extract("not a jpeg".getBytes("US-ASCII")))
    assert(e.getMessage.contains("SOI"))
  }
}
