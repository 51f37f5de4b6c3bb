package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-89 operators, pinned at sf0.001. */
class Round89Spec extends SparkSpec {

  test("s23: walks strictly improve and never beat the exact neighbor") {
    val rows = Round89Queries.s23_graph_greedy_ann(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // greedy can never do better than the true NN
      assert(r.getAs[Long]("final_d2") >= r.getAs[Long]("exact_d2"))
      // a hit means the distances coincide exactly
      if (r.getAs[Long]("hit") == 1L)
        assert(r.getAs[Long]("final_d2") === r.getAs[Long]("exact_d2"))
      assert(r.getAs[Long]("steps") >= 0L)
    }
    // exactly one best walk per query, and it attains the per-query min
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val best = rs.filter(_.getAs[Long]("is_best") == 1L)
      assert(best.length === 1)
      assert(best.head.getAs[Long]("final_d2") ===
        rs.map(_.getAs[Long]("final_d2")).min)
    }
  }

  test("q130: census covers every pair exactly once, no 'other' bucket") {
    val rows = Round89Queries.q130_allen_census(spark, sf).collect()
    val rels = rows.map(_.getAs[String]("rel")).toSet
    val legal = Set("precedes", "preceded_by", "meets", "met_by", "equals",
      "starts", "started_by", "finishes", "finished_by", "during",
      "contains", "overlaps", "overlapped_by")
    assert(rels.subsetOf(legal), s"unexpected relations: ${rels -- legal}")
    assert(!rels.contains("other"))
    // every user pair active on the same day classifies exactly once
    val ev = graft.Tables.load(spark, sf, "events")
    val expected = ev
      .select(col("user_id"), to_date(graft.Tables.tsMicros(ev)).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("u"))
      .agg(sum(expr("u * (u - 1) div 2"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === expected)
  }

  test("p46: sorting by a key collapses that key's runs to its distinct count") {
    val rows = Round89Queries.p46_sort_advisor(spark, sf).collect()
    assert(rows.length === 15) // 3 sort keys x 5 columns
    val li = graft.Tables.load(spark, sf, "lineitem")
    def runsFor(sk: String, c: String): Long =
      rows.find(r => r.getAs[String]("sort_key") == sk &&
        r.getAs[String]("col") == c).get.getAs[Long]("n_runs")
    assert(runsFor("by_partkey", "l_partkey") ===
      li.select(col("l_partkey")).distinct().count())
    assert(runsFor("by_suppkey", "l_suppkey") ===
      li.select(col("l_suppkey")).distinct().count())
    // sorting by an unrelated key never helps a column below its
    // own-sort floor
    assert(runsFor("by_suppkey", "l_partkey") >=
      runsFor("by_partkey", "l_partkey"))
    rows.foreach(r => assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("n")))
  }
}
