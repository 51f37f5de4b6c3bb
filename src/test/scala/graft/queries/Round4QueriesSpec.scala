package graft.queries

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants of the round-4 operators — the contracts the
  * row-hash oracle can't express (file-count layout, pruning supersets,
  * bit-interleave laws, island maximality, interpolation bounds).
  */
class Round4QueriesSpec extends SparkSpec {

  test("compaction rewrites many small files into few right-sized ones") {
    Round4Queries.p12_compaction(spark, sf).collect()
    def parts(dir: String): Int =
      new java.io.File(dir).listFiles()
        .count(f => f.getName.startsWith("part-") && f.length > 0)
    val small = parts(graft.Scratch.dir("p12_small"))
    val compact = parts(graft.Scratch.dir("p12_compact"))
    assert(small == 64, s"ingest simulation must leave 64 files, got $small")
    // at sf0.001 the whole slice is well under one 32 MB target file
    assert(compact < small && compact >= 1,
      s"compaction must reduce the file count (got $compact from $small)")
  }

  test("merge upsert: updates win, inserts land, untouched rows survive") {
    import spark.implicits._
    val out = Round4Queries.p13_merge_upsert(spark, sf)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val nBase = orders.filter($"o_orderkey" % 3 =!= 0).count()
    val nUpd = orders.filter($"o_orderkey" % 2 === 0).count()
    val nOverlap = orders
      .filter($"o_orderkey" % 3 =!= 0 && $"o_orderkey" % 2 === 0).count()
    val total = out.agg(sum($"n")).collect()(0).getLong(0)
    assert(total == nBase + nUpd - nOverlap,
      "merged cardinality = base + inserts (updates replace, not add)")
    // every updated key carries status 'U': the U bucket holds all updates
    val uRows = out.filter($"o_orderstatus" === "U")
      .agg(sum($"n")).collect()(0).getLong(0)
    assert(uRows == nUpd, "update rows must all surface with the new status")
  }

  test("incremental aggregate merge equals the full recompute") {
    import spark.implicits._
    val merged = Round4Queries.p14_incremental_agg(spark, sf)
    val full = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
        .as("total"), count(lit(1)).as("n"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "partial-aggregate merge must be exact, not approximate")
  }

  test("bloom pruning keeps a superset of true matches before the join") {
    import spark.implicits._
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val nKeys = keys.count()
    val bloom = keys.stat.bloomFilter("o_orderkey", nKeys, 0.01)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val trueMatches = li.join(keys, $"l_orderkey" === $"o_orderkey",
      "left_semi").count()
    val bc = spark.sparkContext.broadcast(bloom)
    val mc = udf((k: Long) => bc.value.mightContainLong(k))
    val pruned = li.filter(mc($"l_orderkey")).count()
    assert(pruned >= trueMatches, "bloom filter must never drop a true match")
    assert(pruned <= li.count(), "pruning is a filter, not an expansion")
    val out = Round4Queries.p15_bloom_prune(spark, sf).collect()(0)
    assert(out.getLong(0) == trueMatches,
      "false positives must be re-filtered by the exact join")
  }

  test("interpolated values sit within the bracketing actuals") {
    import spark.implicits._
    val rows = Round4Queries.q60_interpolate(spark, sf).collect()
    assert(rows.nonEmpty)
    // interpolated points lie within [min, max] of the actual series
    val actuals = rows.filter(_.getBoolean(2)).map(_.getDouble(1))
    val lo = actuals.min
    val hi = actuals.max
    rows.filterNot(_.getBoolean(2)).foreach { r =>
      val v = r.getDouble(1)
      assert(v >= lo - 1e-6 && v <= hi + 1e-6,
        s"linear interpolation cannot overshoot the envelope: $v")
    }
    // the series is dense: consecutive dates differ by one day
    val ds = rows.map(_.getDate(0).toLocalDate)
    ds.sliding(2).foreach { case Array(a, b) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) == 1,
        "gap-filled series must be contiguous")
    }
  }

  test("histogram buckets partition all rows exactly once") {
    import spark.implicits._
    val h = Round4Queries.q61_histogram(spark, sf).collect()
    val total = h.map(_.getLong(1)).sum
    val li = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total == li, "histogram must conserve the row count")
    assert(h.map(_.getInt(0)).forall(b => b >= 0 && b <= 9))
  }

  test("islands are maximal: no two islands touch, lengths match spans") {
    val isl = Round4Queries.q62_islands(spark, sf).collect()
    isl.foreach { r =>
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
      assert(span + 1 == r.getLong(2),
        "island length must equal its inclusive day span")
    }
    isl.sliding(2).foreach {
      case Array(a, b) =>
        val gap = java.time.temporal.ChronoUnit.DAYS.between(
          a.getDate(1).toLocalDate, b.getDate(0).toLocalDate)
        assert(gap >= 2, "adjacent islands must be separated by a gap")
      case _ =>
    }
  }

  test("trigram LM scores are log-probabilities: never positive") {
    import spark.implicits._
    val lm = Round4Queries.t9_trigram_lm(spark, sf).collect()
    assert(lm.nonEmpty)
    lm.foreach { r =>
      assert(r.getDouble(2) <= 1e-9,
        s"ln(c3/c2) with c3 <= c2 must be <= 0: ${r.getDouble(2)}")
      assert(r.getLong(1) > 0)
    }
    // each doc's trigram count is tokens - 2
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", size(split(trim($"text"), "\\s+")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    lm.foreach { r =>
      assert(r.getLong(1) == toks(r.getLong(0)) - 2,
        "every trigram position must be scored exactly once")
    }
  }

  test("type-token ratio is bounded and hapax counts are consistent") {
    val t = Round4Queries.t10_ttr(spark, sf).collect()
    t.foreach { r =>
      val (tokens, types, hapax, ttr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(types <= tokens && hapax <= types)
      assert(ttr > 0 && ttr <= 1.0)
    }
  }

  test("passage dedup flags the near-duplicate documents, not the rest") {
    import spark.implicits._
    val d = Round4Queries.d10_passage_dedup(spark, sf).cache()
    try {
      d.collect().foreach { r =>
        assert(r.getLong(2) <= r.getLong(1),
          "shared shingles are a subset of all shingles")
      }
      // the corpus ships with near-duplicate pairs: someone must share
      assert(d.filter($"n_shared" > 0).count() > 0,
        "near-dup documents must surface shared passages")
      // sharing is symmetric: a shingle flagged shared for one doc is
      // flagged for every doc holding it, so shared docs come in groups >= 2
      val sharers = d.filter($"n_shared" > 0).count()
      assert(sharers >= 2, "a shared passage needs at least two holders")
    } finally d.unpersist()
  }

  test("z-ordered layout: most zones provably cannot match the box query") {
    Round4Queries.p16_zorder_layout(spark, sf).collect()
    // read parquet footers: per row group, [min,max] of x and p_size
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val dirF = new java.io.File(graft.Scratch.dir("p16_zsorted"))
    val files = dirF.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 3, "range partitioning must spread the data")
    var total = 0
    var overlapping = 0
    files.foreach { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try rd.getFooter.getBlocks.forEach { b =>
        total += 1
        def range(colName: String): (Long, Long) = {
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == colName).get
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[Number].longValue,
            st.genericGetMax.asInstanceOf[Number].longValue)
        }
        val (xlo, xhi) = range("x")
        val (slo, shi) = range("p_size")
        if (xhi >= 32 && xlo <= 63 && shi >= 10 && slo <= 20) overlapping += 1
      } finally rd.close()
    }
    assert(total >= 3)
    assert(overlapping < total,
      s"z-clustering must let zone stats exclude some row groups " +
        s"($overlapping/$total overlap the box)")
  }

  test("containment: asymmetric prefix filter is lossless vs naive join") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs
      .select($"doc_id".as("id"),
        array_distinct(graft.functions.Text.shingles($"text", 3)).as("shs"))
      .select($"id", size($"shs").as("n_sh"), explode($"shs").as("sh0"))
      .select($"id", $"n_sh", xxhash64($"sh0").as("sh"))
    val naive = sh.as("a")
      .join(sh.as("b"), $"a.sh" === $"b.sh" && $"a.id" =!= $"b.id")
      .groupBy($"a.id".as("id_a"), $"b.id".as("id_b"), $"a.n_sh".as("na"))
      .agg(count(lit(1)).as("inter"))
      .filter($"inter".cast("double") / $"na".cast("double") >= 0.8)
      .select($"id_a", $"id_b")
    val filtered = Round4Queries.d11_containment(spark, sf)
      .select($"id_a", $"id_b")
    assert(filtered.exceptAll(naive).isEmpty &&
      naive.exceptAll(filtered).isEmpty,
      "contained-side prefix filter must drop only sub-threshold pairs")
    // containment is directional: scores live in [0.8, 1]
    Round4Queries.d11_containment(spark, sf).collect().foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.8 && c <= 1.0 + 1e-9)
    }
  }

  test("CDC apply: live state equals customers whose last change survives") {
    import spark.implicits._
    val out = Round4Queries.p17_cdc_apply(spark, sf)
    val live = out.agg(sum($"n_live")).collect()(0).getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .filter($"o_orderkey" % 10 =!= 0).count()
    assert(live == expected,
      "every key must end live or tombstoned, nothing dropped or doubled")
  }

  test("two-pass heavy hitters equal the direct exact computation") {
    import spark.implicits._
    val hh = Round4Queries.a2_heavy_hitters(spark, sf)
    val keyed = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("x", $"l_orderkey" % 4096 + 1)
      .select($"x".bitwiseAND(-$"x").as("key"))
    val n = keyed.count()
    val direct = keyed.groupBy($"key").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 16 > n)
    assert(hh.exceptAll(direct).isEmpty && direct.exceptAll(hh).isEmpty,
      "sketch+recount must be exact, not approximate")
  }

  test("quantized re-rank recovers the exact top-k") {
    val rerank = Round4Queries.s4_ann_rerank(spark, sf).collect()
    val exact = graft.queries.ExtensionQueries
      .s1_cosine_topk(spark, sf).collect()
    assert(rerank.length == exact.length)
    rerank.zip(exact).foreach { case (a, b) =>
      assert(a == b, s"re-rank diverged from exact: $a vs $b")
    }
  }

  test("streaming DQ monitor matches the batch computation") {
    import spark.implicits._
    val stream = Round4Queries.e11_stream_dq(spark, sf).collect()
    assert(stream.nonEmpty)
    stream.foreach { r =>
      assert(r.getLong(5) <= r.getLong(1), "outliers are a subset of rows")
      assert(r.getDouble(3) <= r.getDouble(4), "min <= max")
    }
  }

  test("morton interleave is monotone in each coordinate and invertible") {
    import spark.implicits._
    // exhaustive inverse check over the full 8-bit × 8-bit domain
    val dom = spark.range(0, 256L * 256)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val z = Round4Queries.q64_zorder(spark, sf) // touch the query itself
    assert(z.count() == 20)
    val codes = dom.select($"x", $"y",
        Round4Queries.morton8($"x", $"y").as("z"))
      .collect()
    assert(codes.map(_.getLong(2)).distinct.length == 256 * 256,
      "morton must be a bijection on the domain")
    codes.foreach { r =>
      val (x, y, zz) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // de-interleave and compare
      var xi = 0L; var yi = 0L
      (0 until 8).foreach { b =>
        xi |= ((zz >> (2 * b)) & 1L) << b
        yi |= ((zz >> (2 * b + 1)) & 1L) << b
      }
      assert(xi == x && yi == y, s"de-interleave must invert: ($x,$y) -> $zz")
    }
  }
}
