package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Adversarial skew: corpora where one shingle / fingerprint appears in a
  * large fraction of documents — the boilerplate shape (legal footers,
  * template headers) that makes naive posting-list joins go df²-quadratic
  * at corpus scale. These tests assert the guards engage with *candidate
  * counts*, not just end-to-end correctness: the candidate set size is
  * what the pair join's runtime and shuffle volume scale with.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  test("prefix filter drops a 33%-df boilerplate shingle from the candidate join") {
    // 300 docs; every third doc carries the same 5-word footer. Each doc
    // also has 12 unique words, so the rarest-first prefix never reaches
    // the boilerplate shingles.
    val docs = (0 until 300).map { i =>
      val unique = (0 until 12).map(j => s"u${i}w$j").mkString(" ")
      val boiler =
        if (i % 3 == 0) " all rights reserved worldwide inc" else ""
      (i.toLong, unique + boiler)
    }.toDF("doc_id", "text")
    val sh = Dedup.explodedShingles(Dedup.shingleSets(docs, "doc_id", "text", 3))

    // unguarded posting-list join: the 3 shared footer shingles each link
    // all C(100,2) footer-doc pairs
    val naive = sh.as("a")
      .join(sh.as("b"), $"a.sh" === $"b.sh" && $"a.id" < $"b.id")
      .select($"a.id", $"b.id").distinct().count()
    assert(naive >= 4950L,
      s"the fixture must actually be skewed (naive candidates = $naive)")

    // Bayardo prefix filter at t=0.5: prefixes hold each doc's rarest
    // |s|−⌈t·|s|⌉+1 shingles; the df=100 boilerplate ranks last and never
    // enters the join — candidate set collapses to zero
    val pruned = Dedup.candidatePairs(sh, 0.5).count()
    assert(pruned == 0L,
      s"prefix filter must keep boilerplate out of the join (got $pruned)")

    // and the drop is lossless: no footer pair is actually >= 0.5 Jaccard
    assert(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5).isEmpty)
  }

  test("winnow maxDf cap bounds the df² fingerprint join under boilerplate skew") {
    // 200 docs with unique bodies; 90 share an 80-char footer — long
    // enough that whole winnow windows sit inside it (>= 2(k+w)-2 chars),
    // guaranteeing fingerprints every footer doc emits (df = 90)
    val footerText = " COPYRIGHT NOTICE ALL RIGHTS RESERVED " +
      "REDISTRIBUTION PROHIBITED WORLDWIDE 2024X"
    val docs = (0 until 200).map { i =>
      val body = s"doc$i " +
        (0 until 15).map(j => f"tok$i%03d_$j").mkString(" ")
      val footer = if (i % 2 == 0 && i < 180) footerText else ""
      (i.toLong, body + footer)
    }.toDF("doc_id", "text")

    val uncapped = Dedup.winnowOverlap(docs, "doc_id", "text",
      k = 16, w = 16, minShared = 1, maxDf = None).count()
    assert(uncapped >= 4005L,
      s"uncapped, the df=90 footer fingerprints pair every footer doc " +
        s"with every other (got $uncapped, expected >= C(90,2))")

    // the join's work is Σ df² over the posting lists — the quantity the
    // cap exists to bound. The df=90 buckets must dominate the uncapped
    // cost, and the cap must remove (at least) them.
    val dfs = docs.filter(length($"text") >= 16)
      .select($"doc_id",
        explode(graft.functions.WinnowFingerprints.winnow($"text", 16, 16))
          .as("fp"))
      .groupBy($"fp").agg(count(lit(1)).as("df"))
      .select($"df").collect().map(_.getLong(0))
    val totalCost = dfs.map(d => d * d).sum
    val cappedCost = dfs.filter(_ <= 20L).map(d => d * d).sum
    assert(dfs.max >= 90L, "the fixture must produce df=90 fingerprints")
    assert(cappedCost * 5 < totalCost,
      s"the cap must remove the dominant join cost " +
        s"(capped Σdf²=$cappedCost vs total $totalCost)")

    // end to end: boundary-window fingerprints (small df, legitimately
    // kept) may still relate a few footer pairs, but the df² bulk is gone
    val capped = Dedup.winnowOverlap(docs, "doc_id", "text",
      k = 16, w = 16, minShared = 1, maxDf = Some(20L)).count()
    assert(capped * 10 < uncapped,
      s"capped pair output must collapse (got $capped of $uncapped)")
  }
}
