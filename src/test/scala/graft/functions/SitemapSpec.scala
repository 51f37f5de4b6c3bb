package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sitemap parser: protocol constraints (loc required,
  * priority range), entity decoding, comment/declaration/unknown-
  * element handling, and the fixture closed forms. */
class SitemapSpec extends AnyFunSuite {

  private def census(xml: String) =
    Sitemap.parseRow(org.apache.spark.unsafe.types.UTF8String.fromString(xml))

  test("hand-built urlset parses with constraint checks") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<!-- a comment with <url> inside must be skipped -->
        |<url><loc>https://a.example/x?p=1&amp;q=2</loc>
        |  <lastmod>2024-03-01</lastmod><priority>0.8</priority></url>
        |<url><loc>https://a.example/y</loc><lastmod>2024-01-15</lastmod>
        |  <priority>1.5</priority></url>
        |<url><loc>https://a.example/z</loc><unknown>skip me</unknown></url>
        |</urlset>""".stripMargin
    val r = census(xml)
    assert(r.getInt(0) === 3) // n_urls
    assert(r.getInt(1) === 2) // valid (1.5 is out of protocol range)
    assert(r.getInt(2) === 1)
    assert(r.getInt(3) === 1) // decoded & in the first loc
    assert(r.getLong(4) === 8L) // only the valid 0.8 counts
    assert(r.getUTF8String(5).toString === "2024-01-15")
    assert(r.getUTF8String(6).toString === "2024-03-01")
    assert(r.getLong(7) ===
      "https://a.example/x?p=1&q=2".length + "https://a.example/y".length +
        "https://a.example/z".length)
  }

  test("missing loc and nesting fail loudly") {
    intercept[IllegalArgumentException] {
      census("<urlset><url><priority>0.5</priority></url></urlset>")
    }
    intercept[IllegalArgumentException] {
      census("<urlset><url><url></url></url></urlset>")
    }
  }

  test("fixture closed forms") {
    for (id <- 0L to 12L) {
      val r = census(Sitemap.encode(id).toString)
      val n = (3 + id % 5).toInt
      val invalid = if (id % 5 >= 2) 1 else 0
      assert(r.getInt(0) === n, s"urls id=$id")
      assert(r.getInt(1) === n - invalid, s"valid id=$id")
      assert(r.getInt(2) === invalid, s"invalid id=$id")
      assert(r.getInt(3) === (n + 2) / 3, s"entity id=$id")
      assert(r.getLong(4) === (0 until n).map(u => u % 11).sum -
        (if (invalid == 1) 4 else 0), s"tenths id=$id")
      val days = (0 until n).map(u => ((id + u) % 366).toInt)
      def d(x: Int) = java.time.LocalDate.of(2024, 1, 1).plusDays(x).toString
      assert(r.getUTF8String(5).toString === d(days.min), s"min id=$id")
      assert(r.getUTF8String(6).toString === d(days.max), s"max id=$id")
      val locLen = (0 until n).map(u =>
        22 + id.toString.length + (if (u % 3 == 0) 8 else 0)).sum
      assert(r.getLong(7) === locLen, s"locchars id=$id")
    }
    // the fixture crosses the year wrap: doc_id 365 entry 0 is day 365
    val r = census(Sitemap.encode(364L).toString)
    assert(r.getUTF8String(5).toString === "2024-01-01") // wrapped to day 0
  }
}
