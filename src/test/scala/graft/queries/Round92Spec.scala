package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-92 operators, pinned at sf0.001. */
class Round92Spec extends SparkSpec {

  test("d44: the prefilter rule fires and changes no row") {
    val pruned = Round92Queries.d44_jw_pruned(spark, sf)
    // plan audit: the injected length-ratio bound is in the optimized plan
    val opt = pruned.queryExecution.optimizedPlan.toString
    assert(opt.contains("least(") && opt.contains("greatest("),
      s"JwPrefilterRule did not inject the length bound:\n$opt")
    // soundness: identical result set with and without the rule
    val base = Round87Queries.d41_jaro_winkler(spark, sf).collect()
    assert(pruned.collect().map(_.toSeq).toSeq === base.map(_.toSeq).toSeq)
  }

  test("d44: the bound itself never rejects a qualifying pair") {
    // direct check of the implication on the threshold used by d41:
    // jw >= 0.88 (rounded to 6) => min/max >= 3*(0.88 - 1e-6 - 0.4)/0.6 - 2
    val c = 3.0 * ((0.88 - 1e-6 - 0.4) / 0.6) - 2.0 - 1e-9
    val jw = graft.functions.JaroWinklerSim.similarity _
    val rng = new scala.util.Random(11)
    val alpha = "abcdefg "
    for (_ <- 1 to 3000) {
      val a = (1 to 1 + rng.nextInt(16))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString
      val b = (1 to 1 + rng.nextInt(16))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString
      val v = math.round(jw(a, b) * 1e6) / 1e6
      if (v >= 0.88) {
        val mn = math.min(a.length, b.length).toDouble
        val mx = math.max(a.length, b.length).toDouble
        assert(mn >= mx * c, s"bound would wrongly prune ($a, $b) jw=$v")
      }
    }
  }

  test("d43: ARI is 1 against itself and the reported ARI is in range") {
    val r = Round92Queries.d43_adjusted_rand(spark, sf).collect().head
    val ari = r.getAs[Double]("ari")
    assert(ari >= -1.0 && ari <= 1.0)
    // the coarse quadrant signature over-merges: strictly fewer clusters
    // than exact rasters => sum_a (pairs co-clustered by A) >= index
    assert(r.getAs[Long]("sum_a") >= r.getAs[Long]("index_pairs"))
    assert(r.getAs[Long]("sum_b") >= r.getAs[Long]("index_pairs"))
  }

  test("m29: Parseval holds exactly per document") {
    val rows = Round92Queries.m29_wht_audio(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    // recompute 8 * sum(s^2) from the closed form for every doc
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length === 8)
      val cps = texts(doc).codePoints().toArray
      val s2 = (0 until 64).map { i =>
        val v = ((cps(i % cps.length) * 257) % 65536) - 32768
        v.toLong * v
      }.sum
      assert(rs.map(_.getAs[Long]("energy")).sum === 8L * s2,
        s"Parseval violated for doc $doc")
    }
  }
}
