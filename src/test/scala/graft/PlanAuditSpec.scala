package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regressions guard: the scale properties SCALE.md claims
  * (scan pushdown, column pruning, broadcast strategy, codegen coverage)
  * are asserted here so a refactor that silently loses them fails CI, not
  * a cluster bill.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(FormattedMode)
  }

  test("q2 filter predicates are pushed into the parquet scan") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "range predicates must reach the scan")
  }

  test("dedup reads only the columns it needs") {
    val p = plan("d1_dedup_exact")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "5-column table must prune to the 2 used columns")
  }

  test("star join broadcasts the small dimensions, never the fact side") {
    val p = plan("q33_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  /** AQE only materializes codegen spans in the *executed* plan. */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("aggregates are partial+final hash aggregates inside codegen") {
    val p = executedPlan("q1_agg")
    assert(p.contains("HashAggregate"))
    // "*(n)" prefixes mark whole-stage-codegen stages in simpleString
    assert(p.contains("*("))
  }

  test("native hash expressions stay inside whole-stage codegen") {
    val p = executedPlan("t3_fingerprint_rolling")
    assert(p.contains("rolling_min_hash"))
    assert(p.contains("*("))
  }

  test("range join plans as an equi-join on buckets, not a nested loop") {
    val p = plan("q36_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("partitioned layout prunes to the one matching partition directory") {
    val p = plan("p8_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"),
      "the status predicate must prune partitions, not filter rows")
    // the pruned partition column never appears as a data filter
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      "partition predicate must not degrade to a row-level scan filter")
  }

  test("SCD2 history builds in one hash shuffle (windows reuse it)") {
    // AQE's string repeats the plan under "== Initial Plan ==" — count
    // exchanges only in the final plan above it
    val p = executedPlan("p7_scd2").split("== Initial Plan ==")(0)
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"lag/run-sum/group/lead all share (o_custkey) partitioning; got " +
        s"$hashExchanges hash exchanges:\n$p")
  }

  test("tf-idf broadcasts the term-frequency dictionary and corpus count") {
    val p = executedPlan("t7_tfidf")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }
}
