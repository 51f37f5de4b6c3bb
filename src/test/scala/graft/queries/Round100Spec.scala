package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.NwAlignExpr

/** Invariants for the round-100 operators, pinned at sf0.001. */
class Round100Spec extends SparkSpec {

  test("q144: NW scores match a driver replay and respect bounds") {
    val rows = Round100Queries.q144_needleman_wunsch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val la = r.getAs[Long]("len_a"); val lb = r.getAs[Long]("len_b")
      val sc = r.getAs[Long]("score")
      assert(sc <= 2L * math.min(la, lb), "score above perfect match")
      assert(sc >= -2L * (la + lb), "score below all-gaps floor")
    }
    // expression anchors
    assert(NwAlignExpr.score("ccc", "ccc") === 6L)
    assert(NwAlignExpr.score("", "") === 0L)
    assert(NwAlignExpr.score("p", "") === -2L)
    assert(NwAlignExpr.score("vcpve", "vcpe") === 6L)
    // full replay for every pair at sf0.001
    val ev = graft.Tables.load(spark, sf, "events")
    val strs = ev.select(col("user_id"),
        unix_micros(graft.Tables.tsMicros(ev)).as("us"), col("event_id"),
        expr("""CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
          | WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
          | ELSE 'e' END""".stripMargin).as("ch"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).map { case (u, es) =>
        u -> es.sortBy(e => (e._2, e._3)).map(_._4).mkString
      }
    rows.foreach { r =>
      val sa = strs(r.getAs[Long]("ua")); val sb = strs(r.getAs[Long]("ub"))
      assert(r.getAs[Long]("score") === NwAlignExpr.score(sa, sb))
    }
  }

  test("m34: leaf accounting is consistent and both branches fire") {
    val rows = Round100Queries.m34_quadtree(spark, sf).collect()
    rows.foreach { r =>
      if (r.getAs[Long]("root_split") == 0L) {
        assert(r.getAs[Long]("n_leaves") === 1L)
        assert(r.getAs[Long]("n_split_quads") === 0L)
      } else {
        assert(r.getAs[Long]("n_leaves") ===
          4L + 3L * r.getAs[Long]("n_split_quads"))
        assert(r.getAs[Long]("n_split_quads") <= 4L)
      }
      assert(r.getAs[Long]("sse_root") >= 0L)
    }
    assert(rows.exists(_.getAs[Long]("root_split") == 1L))
    assert(rows.exists(_.getAs[Long]("root_split") == 0L))
  }

  test("d46: the funnel is monotone and stage 0 is the whole corpus") {
    val rows = Round100Queries.d46_dedup_funnel(spark, sf).collect()
      .sortBy(_.getAs[Long]("stage"))
    assert(rows.length === 4)
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(rows.head.getAs[Long]("n_docs") === docs.count())
    assert(rows.head.getAs[Long]("bytes_kept") ===
      docs.agg(sum(col("n_chars"))).collect().head.getLong(0))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"))
        assert(b.getAs[Long]("bytes_kept") <= a.getAs[Long]("bytes_kept"))
      case _ =>
    }
    // the token-set grain genuinely dedups on this corpus
    assert(rows.last.getAs[Long]("n_docs") < rows.head.getAs[Long]("n_docs"))
  }
}
