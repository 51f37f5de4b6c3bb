package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-120 operators, pinned at sf0.001. */
class Round120Spec extends SparkSpec {

  test("a24: overestimates are nonnegative and shrink as width grows") {
    val rows = Round120Queries.a24_cms_width_sweep(spark, sf).collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("width")).toSeq === Seq(64L, 128L, 256L, 512L))
    // CMS never undercounts: every overestimate >= 0
    rows.foreach { r =>
      assert(r.getAs[Long]("max_over") >= 0L)
      assert(r.getAs[Long]("sum_over") >= r.getAs[Long]("max_over"))
    }
    // monotone economics: total overestimate never grows as width doubles
    val sums = rows.map(_.getAs[Long]("sum_over")).toSeq
    sums.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"sum_over must not grow with width: $sums")
    }
    // the bound column is the documented 3N/w integer form
    val n = rows.head.getAs[Long]("n_total")
    rows.foreach { r =>
      assert(r.getAs[Long]("bound_3n_w") === 3 * n / r.getAs[Long]("width"))
    }
  }

  test("p54: sorted batching wastes no more than ingestion order") {
    val rows = Round120Queries.p54_sorted_batching(spark, sf).collect()
    assert(rows.nonEmpty)
    val sortedWaste = rows.map(_.getAs[Long]("pad_waste")).sum
    val naiveWaste = rows.head.getAs[Long]("naive_total_waste")
    assert(sortedWaste <= naiveWaste,
      s"sorted $sortedWaste should beat naive $naiveWaste")
    // batch accounting identities
    rows.foreach { r =>
      assert(r.getAs[Long]("n_items") >= 1L && r.getAs[Long]("n_items") <= 8L)
      assert(r.getAs[Long]("pad_waste") ===
        r.getAs[Long]("n_items") * r.getAs[Long]("max_len") -
          r.getAs[Long]("batch_tokens"))
      assert(r.getAs[Long]("pad_waste") >= 0L)
    }
    // all docs are batched exactly once
    val totalDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_items")).sum === totalDocs)
  }

  test("q165: folds partition each language exactly, deterministically") {
    val a = Round120Queries.q165_kfold_balance(spark, sf).collect()
    val b = Round120Queries.q165_kfold_balance(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // per-language fold counts sum back to the language total
    a.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val tot = rs.head.getAs[Long]("lang_total")
      assert(rs.map(_.getAs[Long]("n")).sum === tot)
      rs.foreach { r =>
        assert(r.getAs[Long]("dev_ppm") ===
          math.abs(r.getAs[Long]("n") * 5 - tot) * 1000000L / tot)
      }
    }
    val folds = a.map(_.getAs[Long]("fold")).distinct.sorted
    assert(folds.forall(f => f >= 0 && f < 5))
  }
}
