package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.BlobCountExpr

/** Invariants for the round-103 operators, pinned at sf0.001. */
class Round103Spec extends SparkSpec {

  test("q146: exactly the key dependencies hold") {
    val rows = Round103Queries.q146_fd_discovery(spark, sf).collect()
    assert(rows.length === 20)
    val holds = rows.filter(_.getAs[Long]("fd_holds") == 1L)
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSet
    // o_orderkey is the key: it determines every other column
    assert(holds === Set(("ok", "ck"), ("ok", "pr"), ("ok", "st"),
      ("ok", "yr")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pair") >= r.getAs[Long]("n_lhs"))
      if (r.getAs[Long]("fd_holds") == 0L)
        assert(r.getAs[Long]("n_pair") > r.getAs[Long]("n_lhs"))
    }
  }

  test("m37: the mask BFS matches a driver flood fill on every doc") {
    val rows = Round103Queries.m37_blob_count(spark, sf).collect()
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val cps = texts(r.getAs[Long]("doc_id")).codePoints().toArray
      val on = (0 until 64)
        .filter(i => cps(i % cps.length) % 256 >= 105).toSet
      // reference flood fill
      var seen = Set.empty[Int]; var blobs = 0L
      on.foreach { s0 =>
        if (!seen(s0)) {
          blobs += 1
          var stack = List(s0)
          while (stack.nonEmpty) {
            val c = stack.head; stack = stack.tail
            if (!seen(c)) {
              seen += c
              Seq(1, -1, 8, -8).foreach { d =>
                val n = c + d
                val wraps = (d == 1 && c % 8 == 7) ||
                  (d == -1 && c % 8 == 0)
                if (!wraps && n >= 0 && n < 64 && on(n) && !seen(n))
                  stack = n :: stack
              }
            }
          }
        }
      }
      assert(r.getAs[Long]("n_blobs") === blobs,
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_on") === on.size.toLong)
      assert(r.getAs[Long]("n_blobs") <= r.getAs[Long]("n_on"))
    }
    // expression anchors: full grid = 1 blob, empty = 0, checkerboard = 32
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(vs: Seq[Int]) = new GenericArrayData(vs.toArray)
    assert(BlobCountExpr.count(arr(Seq.fill(64)(200)), 105) === 1L)
    assert(BlobCountExpr.count(arr(Seq.fill(64)(0)), 105) === 0L)
    val checker = (0 until 64).map(i => if ((i / 8 + i) % 2 == 0) 200 else 0)
    assert(BlobCountExpr.count(arr(checker), 105) === 32L)
  }
}
