package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants of the seventh batch — the contracts the row-hash
  * oracle can't express (the winnowing detection guarantee, fingerprint
  * density, readability formula recomputation).
  */
class Round7QueriesSpec extends SparkSpec {
  import spark.implicits._

  private def winnowSet(s: String, k: Int = 16, w: Int = 16): Set[Long] =
    graft.functions.WinnowFingerprints.compute(s, k, w)
      .toLongArray().toSet

  test("winnowing guarantee: a shared run of k+w-1 yields a shared fingerprint") {
    val rnd = new scala.util.Random(41)
    def randText(n: Int): String =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 20).foreach { _ =>
      val shared = randText(16 + 16 - 1) // k + w - 1
      val a = randText(rnd.nextInt(200)) + shared + randText(rnd.nextInt(200))
      val b = randText(rnd.nextInt(200)) + shared + randText(rnd.nextInt(200))
      assert(winnowSet(a).intersect(winnowSet(b)).nonEmpty,
        s"docs sharing a ${shared.length}-char run must share a fingerprint")
    }
  }

  test("winnowing density: ~2/w of the k-gram count, never above 2x that") {
    val rnd = new scala.util.Random(43)
    val text = Seq.fill(4000)(('a' + rnd.nextInt(26)).toChar).mkString
    val nGrams = text.length - 16 + 1
    val fps = winnowSet(text)
    assert(fps.nonEmpty && fps.size <= nGrams * 4 / 16,
      s"selected ${fps.size} of $nGrams k-gram hashes — winnowing must thin")
  }

  test("winnowing is offset-robust: a prefix edit keeps suffix fingerprints") {
    val rnd = new scala.util.Random(47)
    val body = Seq.fill(500)(('a' + rnd.nextInt(26)).toChar).mkString
    val shifted = "XYZPREFIX" + body
    assert(winnowSet(body).intersect(winnowSet(shifted)).nonEmpty,
      "fingerprints depend on local content, not absolute offsets")
  }

  test("d13 pairs genuinely share fingerprints; overlap bounded by 1") {
    val rows = Round7Queries.d13_winnow_overlap(spark, sf).collect()
    assert(rows.nonEmpty, "the fixture corpus contains near-dup pairs")
    val fps = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length($"text") >= 16)
      .select($"doc_id", graft.functions.WinnowFingerprints
        .winnow($"text", 16, 16).as("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val shared = fps(a).intersect(fps(b)).size
      assert(shared == r.getLong(2), s"pair ($a,$b) shared count")
      assert(shared >= 5, "min-shared gate")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0, "overlap in (0,1]")
    }
  }

  test("maxDf caps boilerplate postings without touching rare-run pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    def randText(n: Int): String =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val boiler = randText(120) // shared by EVERY doc — the mega-posting
    val rareRun = randText(120) // shared by docs 1 and 2 only
    val docs = (
      Seq((1L, boiler + rareRun + randText(50)),
        (2L, randText(50) + boiler + rareRun)) ++
        (3L to 40L).map(i => (i, boiler + randText(100)))
    ).toDF("doc_id", "text")
    def pairs(maxDf: Option[Long]): Set[(Long, Long)] =
      graft.operators.Dedup.winnowOverlap(docs, "doc_id", "text",
          k = 16, w = 16, minShared = 3, maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(None)
    val capped = pairs(Some(5)) // boilerplate fps have df=40 > 5
    // the rare-run pair survives the cap; boilerplate-only pairs do not
    assert(capped.contains((1L, 2L)),
      "a pair sharing a rare 120-char run must survive the df cap")
    assert(uncapped.size > capped.size,
      "boilerplate-only pairs must disappear under the cap")
    assert(capped.subsetOf(uncapped), "the cap only removes pairs")
  }

  test("t15 readability recomputes from its own counts") {
    val rows = Round7Queries.t15_readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, syl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1 && s >= 1 && syl >= w,
        "every word carries at least one syllable")
      val expected = BigDecimal(206.835 - 1.015 * (w.toDouble / s) -
        84.6 * (syl.toDouble / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - expected) < 1e-9,
        s"doc ${r.getLong(0)}: flesch ${r.getDouble(4)} != $expected")
    }
  }
}
