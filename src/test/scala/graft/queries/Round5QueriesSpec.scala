package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants of the fifth batch — the contracts the row-hash
  * oracle can't express (funnel monotonicity, retention bounds, semdedup
  * witness existence, snapshot-isolation file accounting, streaming
  * eviction parity with the batch rule).
  */
class Round5QueriesSpec extends SparkSpec {

  test("funnel stages are monotone: view >= view+click >= full funnel") {
    val r = Round5Queries.q65_funnel(spark, sf).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v > 0, "some users must enter the funnel")
    assert(v >= c && c >= p,
      s"later stages can only lose users (got $v >= $c >= $p)")
  }

  test("retention: week 0 holds the whole cohort, later weeks never more") {
    import spark.implicits._
    val rows = Round5Queries.q66_retention(spark, sf).collect()
    val w0 = rows.filter(_.getInt(1) == 0)
      .map(r => r.getDate(0) -> r.getLong(2)).toMap
    assert(w0.nonEmpty, "every cohort has its own first week")
    rows.filter(_.getInt(1) > 0).foreach { r =>
      assert(r.getLong(2) <= w0(r.getDate(0)),
        "retained users cannot exceed the cohort size")
    }
    // cohort sizes sum to the distinct-user universe
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id").distinct().count()
    assert(w0.values.sum == users,
      "week-0 rows partition the user universe by first-active week")
  }

  test("interval window: counts include the current row, bounded by user total") {
    import spark.implicits._
    val out = Round5Queries.q67_interval_window(spark, sf)
    assert(out.filter($"n_1h" < 1).isEmpty,
      "the trailing window always contains the row itself")
    val perUser = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"user_id").agg(count(lit(1)).as("tot"))
    assert(out.join(perUser, "user_id").filter($"n_1h" > $"tot").isEmpty,
      "a trailing window can never exceed the user's full history")
  }

  test("repetition fractions are bounded and consistent") {
    import spark.implicits._
    val out = Round5Queries.t11_repetition(spark, sf)
    // rounded to 6 decimals, so compare with half-ulp slack
    assert(out.filter($"top_word_frac" * $"n_tokens" <
      lit(1) - $"n_tokens" * 5e-7).isEmpty,
      "the top word occurs at least once")
    assert(out.filter($"top_word_frac" > 1 || $"top_bigram_frac" > 1 ||
      $"dup_trigram_frac" >= 1 || $"dup_trigram_frac" < 0).isEmpty,
      "fractions live in [0,1] (dup fraction strictly below 1)")
  }

  test("semdedup drops exactly the vectors with a lower-id near neighbor") {
    // independent recompute in plain Scala over the collected vectors —
    // a different code path from both the query and the DuckDB oracle
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val expected = (for {
      (ia, la, va) <- rows
      (ib, lb, vb) <- rows
      if la == lb && ia < ib && cos(va, vb) >= 0.30
    } yield ib).toSet
    val got = Round5Queries.d12_semdedup(spark, sf).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(got == expected,
      s"dropped set must match the brute-force rule " +
        s"(extra=${got -- expected}, missing=${expected -- got})")
    // the minimum id of every cluster is structurally undroppable
    val minIds = rows.groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(minIds.intersect(got).isEmpty)
  }

  test("knn vote emits one plurality winner per query") {
    val out = Round5Queries.s5_knn_classify(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "exactly one verdict per query")
    out.foreach { r =>
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 10, "vote counts come from the top-10")
    }
  }

  test("time travel: v1 plans only v1's files; v2 extends v1") {
    val out = Round5Queries.p19_time_travel(spark, sf).collect()
    assert(out.length == 2)
    val (n1, n2) = (out(0).getLong(1), out(1).getLong(1))
    assert(n1 < n2, "the v2 snapshot strictly extends v1")
    // the manifest is a real on-disk artifact and v1's list excludes delta
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(graft.Scratch.dir("p19_manifest"),
        "manifest.json")), "UTF-8")
    val lines = manifest.split("\n")
    assert(lines.length == 2)
    assert(lines(0).contains("\"version\":1") && !lines(0).contains("v2delta"),
      "version 1 must reference only base files")
    assert(lines(1).contains("v2delta"),
      "version 2 must include the delta files")
  }

  test("top event paths cover at most the user universe, 10 rows max") {
    import spark.implicits._
    val rows = Round5Queries.q68_event_path(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum <= users,
      "each user contributes exactly one path")
  }

  test("entropy signals are bounded by the alphabet size") {
    import spark.implicits._
    val out = Round5Queries.t12_entropy(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select($"doc_id", length($"text").as("n")), "doc_id")
    assert(out.filter($"char_entropy" < 0 ||
      $"char_entropy" > log2($"n") + 1e-6).isEmpty,
      "0 <= H(chars) <= log2(n_chars)")
    assert(out.filter($"word_entropy" < 0).isEmpty)
    // words carry at least as much surprise per symbol as characters on
    // natural text is NOT an invariant; but both must be finite
    assert(out.filter($"word_entropy".isNull || $"char_entropy".isNull)
      .isEmpty)
  }

  test("content-defined chunking realigns after an inserted prefix") {
    import spark.implicits._
    import graft.functions.CdcCuts
    // the LBFS property fixed-size blocks lack: shifting the content by a
    // prefix must leave most chunk digests intact (boundaries re-sync at
    // the first content-defined cut after the edit)
    def digests(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"text",
        array_sort(array_union(CdcCuts.cdcCuts($"text", 16, 6),
          array(length($"text")))).as("cuts"))
      .select($"doc_id", $"text",
        explode(expr("""transform(cuts, (c, i) ->
          |  struct(CASE WHEN i = 0 THEN 1 ELSE cuts[i-1] + 1 END AS start,
          |         c AS fin))""".stripMargin)).as("ch"))
      .select($"doc_id",
        md5(expr("substring(text, ch.start, ch.fin - ch.start + 1)"))
          .as("digest"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").filter(length($"text") >= 300)
    val base = digests(docs)
    val shifted = digests(docs.withColumn("text",
      concat(lit("INSERTED PREFIX EDIT "), $"text")))
    val resynced = base.keys.count(k => (base(k) & shifted(k)).nonEmpty)
    assert(resynced >= base.size * 2 / 3,
      s"chunk digests must survive a prefix edit for most long docs " +
        s"($resynced/${base.size} re-synced)")
  }

  test("session_window emission equals the batch gap rule with eviction") {
    import spark.implicits._
    // batch recompute of the documented semantics: new session when the
    // gap >= 30 min; emit only sessions whose (last event + gap) is at or
    // before the terminal watermark (max event time - 30 min)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val e = raw.select($"user_id", $"event_id",
      graft.Tables.tsMicros(raw).as("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))
    val maxTs = e.agg(max($"ts")).collect()(0).getTimestamp(0)
    val batch = e
      .withColumn("new_sess",
        when(gapUs.isNull || gapUs >= 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_no", sum($"new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_no")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("sess_start"),
        (unix_micros(max($"ts")) + 1800L * 1000000L).as("end_us"))
      .filter($"end_us" <= unix_micros(lit(maxTs)) - 1800L * 1000000L)
      .select($"user_id", $"sess_start",
        timestamp_micros($"end_us").as("sess_end"), $"n_events")
    val streamed = Round5Queries.e12_stream_session_window(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "the built-in session_window must match the batch definition exactly")
  }
}
