package graft.operators

import java.nio.file.Files
import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val frozen = new Clock {
    // 2024-01-02T00:00:00Z
    val nowEpochMillis: Long = 1704153600000L
  }

  test("dq: row-count gate") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    assert(Quality.dqCheck(df, minRows = 2).status)
    assert(!Quality.dqCheck(df, minRows = 3).status)
  }

  test("dq: nonnull gate with per-column counts") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("id", "v")
    val r = Quality.dqCheck(df, nonnullCols = Seq("id", "v"))
    assert(!r.nonnullOk && !r.status)
    assert(r.nullCounts == Map("id" -> 1L, "v" -> 1L))
    assert(Quality.dqCheck(df.na.drop(), nonnullCols = Seq("id", "v")).status)
  }

  test("dq: freshness against injected clock") {
    val df = Seq("2024-01-01T23:30:00", "2024-01-01T20:00:00").toDF("ts")
    val fresh = Quality.dqCheck(df, freshnessMinutes = Some(60),
      timestampCol = Some("ts"), clock = frozen)
    assert(fresh.freshOk && fresh.lagMinutes.contains(30.0))
    val stale = Quality.dqCheck(df, freshnessMinutes = Some(10),
      timestampCol = Some("ts"), clock = frozen)
    assert(!stale.freshOk && !stale.status)
  }

  test("dq status invariant: status == (rows ok ∧ nonnull ∧ fresh)") {
    val df = Seq((1, "a")).toDF("id", "v")
    for {
      minRows <- Seq(1L, 5L)
      cols <- Seq(Nil, Seq("id"))
    } {
      val r = Quality.dqCheck(df, minRows, cols)
      assert(r.status == (r.rows >= minRows && r.nonnullOk && r.freshOk))
    }
  }

  test("verifyCsv: missing/empty file fails with error") {
    val r = Quality.verifyCsv(spark, "/no/such.csv")
    assert(!r.status && r.error.isDefined)
  }

  test("verifyCsv: rows + nonnull + mtime freshness fallback") {
    val p = tmpDir("vr").resolve("out.csv")
    Files.writeString(p, "id,v\n1,a\n2,b\n3,c\n")
    val ok = Quality.verifyCsv(spark, p.toString, minRows = 3,
      nonnullCols = Seq("id", "v"))
    assert(ok.status && ok.rows == 3 && ok.lagMinutes.exists(_ < 5))
    val tooFew = Quality.verifyCsv(spark, p.toString, minRows = 10)
    assert(!tooFew.status)
  }

  test("verifyCsv: timestamp-column freshness") {
    val p = tmpDir("vr2").resolve("ts.csv")
    Files.writeString(p, "id,updated\n1,2024-01-01T23:45:00\n2,2024-01-01T10:00:00\n")
    val r = Quality.verifyCsv(spark, p.toString,
      timestampCol = Some("updated"), maxLagMinutes = 30, clock = frozen)
    assert(r.status && r.lagMinutes.contains(15.0))
    val stale = Quality.verifyCsv(spark, p.toString,
      timestampCol = Some("updated"), maxLagMinutes = 10, clock = frozen)
    assert(!stale.status)
  }
}
