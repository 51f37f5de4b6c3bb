package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Adversarial skew: corpora where one shingle / fingerprint appears in a
  * large fraction of documents — the boilerplate shape (legal footers,
  * template headers) that makes naive posting-list joins go df²-quadratic
  * at corpus scale. These tests assert the guards engage with *candidate
  * counts*, not just end-to-end correctness: the candidate set size is
  * what the pair join's runtime and shuffle volume scale with. Both
  * directions are pinned — the boilerplate-only pairs the guards must
  * drop, and the genuine near-dup pairs they must keep.
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

  test("prefix filter under skew still admits every genuine near-dup pair") {
    // same boilerplate skew (70 docs share a 10-token footer), plus 5
    // planted clone pairs — the positive control: the guard must bound
    // the join AND the bound must be lossless for true duplicates
    val boiler = "shared boiler plate header common to many corpus documents here"
    val base = (0 until 200).map { i =>
      val body = (0 until 30).map(k => s"u${i}_$k").mkString(" ")
      (i.toLong, if (i % 10 < 3) s"$body $boiler" else body)
    }
    val clones = (0 until 5).flatMap { j =>
      val body = (0 until 30).map(k => s"c${j}_$k").mkString(" ")
      val text = s"$body $boiler"
      Seq((1000L + j, text), (2000L + j, text))
    }
    val corpus = spark.createDataFrame(base ++ clones).toDF("id", "text")
    val posting = Dedup.postingList(Dedup.shingleSets(corpus, "id", "text", 3))
      .localCheckpoint()
    val naive = posting.as("a")
      .join(posting.as("b"), $"a.sh" === $"b.sh" && $"a.id" < $"b.id")
      .select($"a.id", $"b.id").distinct().count()
    assert(naive >= 2000, s"naive join must blow up on skew (got $naive)")
    val clonePairs = (0 until 5).map(j => (1000L + j, 2000L + j)).toSet
    val filtered = Dedup.candidatePairs(posting, threshold = 0.5).collect()
    assert(filtered.length == 5 &&
      filtered.map(r => (r.getLong(0), r.getLong(1))).toSet == clonePairs,
      s"candidates must be exactly the 5 clone pairs, got " +
        filtered.map(r => (r.getLong(0), r.getLong(1))).mkString(", "))
    // end to end: exact Jaccard over the filtered candidates finds the
    // clones at similarity 1.0 and nothing else
    val pairs = Dedup.ngramJaccard(corpus, "id", "text", n = 3,
      threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == clonePairs)
    pairs.foreach(r => assert(r.getDouble(2) == 1.0,
      s"clones are identical, got jaccard ${r.getDouble(2)}"))
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

  test("winnow maxDf cap keeps exact-clone pairs under boilerplate skew") {
    // positive control for the cap: 70 docs share a ~200-char footer,
    // plus 5 clone pairs; with the cap on, exactly the clones survive
    val longBoiler = "this boilerplate legal footer is shared by most " +
      "documents in the corpus and would alone contribute quadratically " +
      "many candidate pairs if the document frequency cap did not drop " +
      "its fingerprints before the join"
    val base = (0 until 200).map { i =>
      val body = (0 until 8).map(k => s"w${i}x$k").mkString(" ")
      (i.toLong, if (i % 10 < 3) s"$body $longBoiler" else body)
    }
    val clones = (0 until 5).flatMap { j =>
      val text = (0 until 8).map(k => s"q${j}y$k").mkString(" ") +
        s" $longBoiler"
      Seq((1000L + j, text), (2000L + j, text))
    }
    val docs = spark.createDataFrame(base ++ clones).toDF("id", "text")
    val uncapped = Dedup.winnowOverlap(docs, "id", "text",
      k = 16, w = 16, minShared = 2, maxDf = None).count()
    assert(uncapped >= 1000,
      s"uncapped boilerplate must pair quadratically (got $uncapped)")
    val capped = Dedup.winnowOverlap(docs, "id", "text",
      k = 16, w = 16, minShared = 2, maxDf = Some(10)).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (0 until 5).map(j => (1000L + j, 2000L + j)).toSet,
      "the cap must leave exactly the clone pairs")
  }
}
