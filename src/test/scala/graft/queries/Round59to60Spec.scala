package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the rounds-59..60 operators, plus the sequential-replay
  * law for the new Holt fold (the ordering guarantee the secondary sort
  * must deliver under ANY input partitioning).
  */
class Round59to60Spec extends SparkSpec {

  test("holtTrend equals the sequential fold under shuffled input") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      k <- 0L until 5L
      i <- 0 until 40
    } yield (k, i, rnd.nextInt(200).toLong - 50) // negatives exercised
    val shuffled = rnd.shuffle(rows).toDF("k", "i", "x").repartition(7)
    val got = graft.operators.OrderedScan
      .holtTrend(shuffled, col("k"), Seq(col("i")), col("x"))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_steps"), r.getAs[Long]("final_level"),
          r.getAs[Long]("final_trend"), r.getAs[Long]("max_level"))).toMap
    for (k <- 0L until 5L) {
      val xs = rows.filter(_._1 == k).sortBy(_._2).map(_._3)
      var l = xs.head; var b = 0L; var mx = l
      xs.tail.foreach { x =>
        val l2 = (x + l + b) / 2; b = (b + (l2 - l)) / 2; l = l2
        if (l > mx) mx = l
      }
      assert(got(k) === ((xs.length.toLong, l, b, mx)), s"key $k")
    }
  }

  test("q107: KS statistic is a valid sup-distance on the lattice") {
    val r = Round59Queries.q107_ks_drift(spark, sf).head()
    val (n, m, d) = (r.getAs[Long]("n"), r.getAs[Long]("m"),
      r.getAs[Long]("d_num"))
    assert(d >= 0 && d <= n * m, "0 <= D*n*m <= n*m")
    val bp = r.getAs[Long]("ks_bp")
    assert(bp >= 0 && bp <= 10000)
  }

  test("p36/p37: zone maps never drop matches and clustering prunes") {
    val p36 = Round59Queries.p36_stats_prune(spark, sf).head()
    assert(p36.getAs[Long]("n_files_read") <= p36.getAs[Long]("n_files_total"))
    val audit = Round60Queries.p37_layout_audit(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val cl = audit("clustered"); val sc = audit("scattered")
    assert(cl.getAs[Long]("n_rows_matched") === sc.getAs[Long]("n_rows_matched"),
      "zone-map selection must be result-invariant")
    assert(cl.getAs[Long]("rows_scanned") <= sc.getAs[Long]("rows_scanned"),
      "clustering must not scan more than the scattered layout")
    assert(cl.getAs[Long]("rows_scanned") >= cl.getAs[Long]("n_rows_matched"),
      "selected files contain at least the matches")
    // p36's physical prune must agree with p37's clustered audit
    assert(p36.getAs[Long]("n_files_read") === cl.getAs[Long]("n_files_read"))
  }

  test("t37: BPE cannot merge across words — fertility >= 1 token/word") {
    val bad = Round59Queries.t37_tokenizer_fertility(spark, sf)
      .filter(col("fertility_bp") < 10000).count()
    assert(bad === 0)
  }
}
