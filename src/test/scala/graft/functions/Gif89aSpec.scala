package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the animated-GIF walk: NETSCAPE loop, GCE timeline, comment
  * skipping, per-frame LZW decode, and the m53 oracle closed forms —
  * plus interop: the JDK's own ImageIO reader must agree on frame
  * count and the first frame's pixels. */
class Gif89aSpec extends AnyFunSuite {

  test("fixture census matches the closed forms") {
    for (id <- 0L to 15L) {
      val row = Gif89a.census(Gif89a.encode(id))
      val n = (2 + id % 3).toInt
      assert(row.getInt(0) === n, s"frames id=$id")
      assert(row.getInt(1) === (id % 5).toInt, s"loop id=$id")
      assert(row.getLong(2) === 10L * (n + n * (n - 1) / 2), s"delay id=$id")
      assert(row.getInt(3) === 10 * n, s"maxdelay id=$id")
      assert(row.getInt(4) === n / 2, s"disposal id=$id")
      val first = (0 until 64).map(p => (id + p) % 251).sum
      val lastS = (0 until 64).map(p => (id + 17 * (n - 1) + p) % 251).sum
      assert(row.getLong(5) === first, s"firstsum id=$id")
      assert(row.getLong(6) === lastS, s"lastsum id=$id")
      assert(row.getInt(7) === 1, s"comments id=$id")
    }
  }

  test("ImageIO interop: the JDK reader agrees on frames and pixels") {
    val bytes = Gif89a.encode(9L) // 2 + 9%3 = 2 frames
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    assert(reader.getNumImages(true) === 2 + (9 % 3).toInt)
    val img = reader.read(0)
    assert(img.getWidth === 8 && img.getHeight === 8)
    var sum = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      sum += img.getRaster.getSample(x, y, 0) // gray palette: R==index
    assert(sum === (0 until 64).map(p => (9L + p) % 251).sum)
    reader.dispose()
  }

  test("malformed streams fail loudly") {
    intercept[IllegalArgumentException] {
      Gif89a.census("NOTAGIF".getBytes("US-ASCII"))
    }
    val good = Gif89a.encode(3L)
    val truncated = java.util.Arrays.copyOf(good, good.length - 10)
    intercept[Exception] { Gif89a.census(truncated) }
  }
}
