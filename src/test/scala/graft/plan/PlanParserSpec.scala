package graft.plan

import org.scalatest.funsuite.AnyFunSuite

class PlanParserSpec extends AnyFunSuite {

  test("strips yaml fences") {
    val got = PlanParser.stripWrappers(
      "```yaml\nsource:\n  kind: csv\n```")
    assert(got == "source:\n  kind: csv")
  }

  test("strips mel heredoc wrapper") {
    val got = PlanParser.stripWrappers("mel <<EOF\nsource:\n  kind: csv\nEOF")
    assert(got == "source:\n  kind: csv")
  }

  test("expands ${VAR} and $VAR, leaves unknown verbatim") {
    val env = Map("API_KEY" -> "k123")
    assert(PlanParser.expandEnv("url: $API_KEY/${API_KEY}/$NOPE", env) ==
      "url: k123/k123/$NOPE")
  }

  test("parses the full declared surface with defaults") {
    val p = PlanParser.parse(
      """source:
        |  kind: csv
        |  csv:
        |    paths: {sales: /a.csv, features: /b.csv, stores: /c.csv}
        |transform:
        |  steps:
        |    - name: s1
        |      sql: SELECT 1
        |    - name: s2
        |      sql: SELECT 2
        |load:
        |  to: csv
        |  file_path: /tmp/out.csv
        |checks:
        |  min_rows: 10
        |  nonnull_cols: [a, b]
        |verify:
        |  ts_col: ts
        |  max_lag_minutes: 60
        |alerts:
        |  on_fail: slack://#data-alerts
        |""".stripMargin)
    assert(p.limits.maxInputBytes == 1073741824L)
    assert(p.source.csv.get.paths == Map(
      "sales" -> "/a.csv", "features" -> "/b.csv", "stores" -> "/c.csv"))
    assert(p.transform.steps.map(_.name) == Seq("s1", "s2"))
    assert(p.load.get.to == "csv" && p.load.get.filePath.contains("/tmp/out.csv"))
    assert(p.checks.minRows == 10 && p.checks.nonnullCols == Seq("a", "b"))
    assert(p.verify.tsCol.contains("ts") && p.verify.maxLagMinutes == 60)
    assert(p.alerts.onFail.contains("slack://#data-alerts"))
  }

  test("kind auto inference: db > api > csv > json > default api") {
    def src(kind: String = "auto",
        csv: Option[CsvSource] = None, json: Option[JsonSource] = None,
        db: Option[DbSource] = None, api: Option[ApiSource] = None) =
      Source(kind, csv, json, db, api)
    assert(PlanParser.inferKind(src(db = Some(DbSource("postgresql://x/db", "q")))) == "db")
    assert(PlanParser.inferKind(src(api = Some(ApiSource("https://x")))) == "api")
    assert(PlanParser.inferKind(src(csv = Some(CsvSource(path = Some("/a.csv"))))) == "csv")
    assert(PlanParser.inferKind(src(json = Some(JsonSource("/a.json")))) == "json")
    assert(PlanParser.inferKind(src()) == "api")
    assert(PlanParser.inferKind(src(kind = "csv")) == "csv")
  }

  test("checks.disabled is honored (reference silently ignored it)") {
    val p = PlanParser.parse(
      "source:\n  kind: csv\nchecks:\n  disabled: true\n")
    assert(p.checks.disabled)
  }

  test("non-mapping plan rejected") {
    intercept[PlanParser.PlanParseException](PlanParser.parse("- a\n- b"))
  }

  test("missing source rejected") {
    intercept[PlanParser.PlanParseException](PlanParser.parse("checks: {}"))
  }
}
