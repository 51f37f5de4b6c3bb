package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.JaroWinklerSim

/** Invariants for the round-87 operators, pinned at sf0.001. */
class Round87Spec extends SparkSpec {

  test("jaro_winkler: published anchors and boundary semantics") {
    val jw = JaroWinklerSim.similarity _
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.961111) < 1e-6)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.813333) < 1e-6)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-6)
    // boost threshold: jaro 2/3 < 0.7 gets NO prefix bonus
    assert(math.abs(jw("abcdef", "abczzz") - 2.0 / 3.0) < 1e-12)
    // prefix capped at 4 even with a 6-char common prefix:
    // jaro 5/6 + 4*0.1*(1/6) = 0.9 exactly (DuckDB agrees)
    assert(math.abs(jw("abcdefgh", "abcdefzz") - 0.9) < 1e-12)
    assert(jw("", "") === 0.0)       // DuckDB convention: empty -> 0
    assert(jw("ABC", "") === 0.0)
    assert(jw("A", "A") === 1.0)
    assert(jw("AB", "BA") === 0.0)   // window 0 -> no matches
    // transposition pair
    assert(math.abs(jw("CRATE", "TRACE") - 0.733333) < 1e-6)
  }

  test("jaro_winkler: ASCII byte path is bit-identical to the char path") {
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(7)
    val alpha = "abcXYZ 019#"
    for (_ <- 1 to 2000) {
      val x = (1 to rng.nextInt(14)).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      val y = (1 to rng.nextInt(14)).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      assert(JaroWinklerSim.similarityU(
        UTF8String.fromString(x), UTF8String.fromString(y)) ===
        JaroWinklerSim.similarity(x, y), s"($x, $y)")
    }
    // non-ASCII falls back to the char path
    assert(JaroWinklerSim.similarityU(
      UTF8String.fromString("héllo"), UTF8String.fromString("hello")) ===
      JaroWinklerSim.similarity("héllo", "hello"))
  }

  test("jaro_winkler: codegen'd column path agrees with the static eval") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("small ring", "small rings"), ("red widget", "red gadget"),
      ("", "x"), ("same", "same")).toDF("a", "b")
    val viaCol = pairs
      .select(col("a"), col("b"),
        JaroWinklerSim.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    viaCol.foreach { r =>
      assert(r.getDouble(2) ===
        JaroWinklerSim.similarity(r.getString(0), r.getString(1)))
    }
  }

  test("d41: every returned pair shares a brand and scores >= 0.88") {
    val rows = Round87Queries.d41_jaro_winkler(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("jw") >= 0.88)
      assert(r.getAs[Long]("pa") < r.getAs[Long]("pb"))
    }
  }

  test("a22: estimator is unbiased-shaped — mean of est_sq within 3x of exact F2") {
    val rows = Round87Queries.a22_ams_f2(spark, sf).collect()
    assert(rows.length === 16)
    val exact = rows.head.getAs[Long]("f2_exact")
    assert(exact > 0)
    val mean = rows.map(_.getAs[Long]("est_sq")).sum.toDouble / 16
    // 16 4-wise-independent estimators: mean concentrates near F2;
    // a broken (correlated) sign hash collapses to ~1% of F2
    assert(mean > exact / 3.0 && mean < exact * 3.0,
      s"mean-of-16 $mean vs exact $exact out of family")
  }

  test("q128: community masses partition the graph exactly") {
    val rows = Round87Queries.q128_modularity(spark, sf).collect()
    val e = Round6Queries.copurchaseEdges(spark, sf)
    val m = e.count()
    // within-community edges never exceed the total; degree mass sums to 2m
    assert(rows.map(_.getAs[Long]("l_in")).sum <= m)
    assert(rows.map(_.getAs[Long]("deg_sum")).sum === 2 * m)
    // sum of contributions is the (rounded) modularity Q in [-1, 1]
    val q = rows.map(_.getAs[Double]("contrib")).sum
    assert(q >= -1.0 && q <= 1.0)
  }

  test("p45: layout stats are internally consistent") {
    val rows = Round87Queries.p45_encoding_stats(spark, sf).collect()
    assert(rows.map(_.getAs[String]("col")).toSet === Set("l_orderkey",
      "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"))
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val runs = r.getAs[Long]("n_runs")
      val nd = r.getAs[Long]("n_distinct")
      assert(runs >= nd || r.getAs[String]("col") == "l_orderkey")
      assert(runs <= n && nd <= n)
      val w = r.getAs[Long]("bit_width")
      val span = r.getAs[Long]("vmax") - r.getAs[Long]("vmin")
      // bin() width is exactly floor(log2(span)) + 1
      if (span > 0) {
        assert((1L << (w - 1)) <= span && (w == 63 || span < (1L << w)))
      } else assert(w === 0)
      // the chosen encoding is the arg-min of the three costs
      val costs = Map(
        "bitpack" -> r.getAs[Long]("bitpack_bytes"),
        "rle" -> r.getAs[Long]("rle_bytes"),
        "dict" -> r.getAs[Long]("dict_bytes"))
      assert(costs(r.getAs[String]("best_encoding")) === costs.values.min)
    }
    // orderkey is constant within its partition: runs == distinct orderkeys
    val ok = rows.find(_.getAs[String]("col") == "l_orderkey").get
    assert(ok.getAs[Long]("n_runs") === ok.getAs[Long]("n_distinct"))
  }
}
