package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-112 operators, pinned at sf0.001. */
class Round112Spec extends SparkSpec {

  private def lrShares(weights: Seq[(String, Long)], total: Long)
      : Map[String, Long] = {
    val w = weights.map(_._2).sum
    val base = weights.map { case (k, c) => (k, c, total * c / w,
      total * c % w) }
    val leftover = total - base.map(_._3).sum
    val bump = base.sortBy { case (k, _, _, r) => (-r, k) }
      .take(leftover.toInt).map(_._1).toSet
    base.map { case (k, _, b, _) =>
      k -> (b + (if (bump.contains(k)) 1L else 0L)) }.toMap
  }

  test("q159: EMD replays from raw hourly counts; metric axioms hold") {
    val rows = Round112Queries.q159_wasserstein_drift(spark, sf).collect()
    assert(rows.length === 10)
    val raw = graft.Tables.load(spark, sf, "events")
    val counts = raw.select(col("event_type"),
        hour(graft.Tables.tsMicros(raw)).cast("long").as("hr"))
      .groupBy(col("event_type"), col("hr")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = counts.groupBy(_._1).map { case (et, xs) =>
      // zero-pad the hour key so the string tiebreak == numeric order
      val shares = lrShares(xs.map(x => (f"${x._2}%02d", x._3)).toSeq, 1000L)
      et -> (0L to 23L).map(h => shares.getOrElse(f"$h%02d", 0L))
    }
    def emd(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x - y }.scanLeft(0L)(_ + _).tail
        .map(math.abs).sum
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val want = emd(byType(ta), byType(tb))
      assert(r.getAs[Long]("emd_permille_hours") === want,
        s"EMD differs for $ta/$tb")
      assert(want >= 0L && want <= 23L * 1000L)
      // identity of indiscernibles on the normalized masses
      if (byType(ta) == byType(tb)) assert(want === 0L)
    }
    // triangle inequality across one triple (EMD is a metric)
    val ts = byType.keys.toSeq.sorted.take(3)
    if (ts.length == 3) {
      val Seq(x, y, z) = ts
      assert(emd(byType(x), byType(z)) <=
        emd(byType(x), byType(y)) + emd(byType(y), byType(z)))
    }
  }

  test("q160: apportionment sums to exactly 10000 and stays within 1 of quota") {
    val rows = Round112Queries.q160_largest_remainder(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("basis_points")).sum === 10000L)
    val totalCents = rows.map(_.getAs[Long]("cents")).sum
    val want = lrShares(rows.map(r => (r.getAs[String]("n_name"),
      r.getAs[Long]("cents"))).toSeq, 10000L)
    rows.foreach { r =>
      val nm = r.getAs[String]("n_name")
      val bp = r.getAs[Long]("basis_points")
      assert(bp === want(nm), s"share differs for $nm")
      // within one unit of the exact (unrounded) quota — the Hamilton
      // method's defining property
      val quota = 10000.0 * r.getAs[Long]("cents") / totalCents
      assert(bp >= math.floor(quota).toLong && bp <= math.ceil(quota).toLong)
    }
  }

  test("t63: LZ78 phrase counts replay; expression anchors") {
    import graft.functions.Lz78Expr
    val a = spark.range(1).select(
      Lz78Expr.lz78Phrases(lit("aaaa")).as("x"),
      Lz78Expr.lz78Phrases(lit("abab")).as("y"),
      Lz78Expr.lz78Phrases(lit("")).as("z"),
      Lz78Expr.lz78Phrases(lit("abcdefg")).as("w")).collect()(0)
    assert(a.getLong(0) === 3L) // a | aa | a
    assert(a.getLong(1) === 3L) // a | b | ab
    assert(a.getLong(2) === 0L)
    assert(a.getLong(3) === 7L) // all fresh singletons
    val rows = Round112Queries.t63_lz78_probe(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z ]", ""),
          1, 48).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lz78(p: String): Long = {
      var dict = List.empty[String]
      var pos = 0; var n = 0L
      while (pos < p.length) {
        val best = dict.filter(d => d.length <= p.length - pos &&
          p.regionMatches(pos, d, 0, d.length)).map(_.length)
          .foldLeft(0)(math.max)
        dict = p.substring(pos, pos + math.min(best + 1, p.length - pos)) ::
          dict
        pos += best + 1; n += 1L
      }
      n
    }
    rows.foreach { r =>
      val p = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("lz78_phrases") === lz78(p))
      assert(r.getAs[Long]("n_chars") === p.length.toLong)
    }
  }
}
