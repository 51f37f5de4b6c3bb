package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-104 operators, pinned at sf0.001. */
class Round104Spec extends SparkSpec {

  test("d47: every rule is load-bearing and variants always collapse") {
    val rows = Round104Queries.d47_url_canonicalization(spark, sf).collect()
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_variants") === 2L)
      assert(r.getAs[Long]("n_canon") === 1L,
        s"doc ${r.getAs[Long]("doc_id")} variants did not collapse")
      val c = r.getAs[String]("canon_url")
      assert(c.startsWith("https://"), "scheme lowercased")
      assert(!c.contains(":443"), "default port stripped")
      assert(!c.contains("utm_"), "tracking params dropped")
      assert(!c.contains("#"), "fragment removed")
      assert(c.contains("?a=1&b=2"), "params sorted")
      assert(c === c.toLowerCase || c.contains("?"),
        "host must be lowercase")
    }
  }

  test("e34: streaming ingest admits exactly one row per canonical URL") {
    val r = Round104Queries.e34_stream_url_dedup(spark, sf).collect().head
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(r.getAs[Long]("n_admitted") === nDocs)
    assert(r.getAs[Long]("n_distinct_canon") === nDocs)
    assert(r.getAs[Long]("n_docs") === nDocs)
  }
}
