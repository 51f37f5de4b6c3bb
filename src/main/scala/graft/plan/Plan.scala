package graft.plan

/** The pipeline plan ADT — the engine's IR.
  *
  * Mirrors the reference's declared YAML schema (reference templates.py:1-10,
  * plan.yaml:1-50): `limits / source / transform / load / checks / verify /
  * alerts / schedule`. The reference keeps the plan as a raw YAML dict and
  * indexes it with string keys at each stage (templates.py:51-170); here it
  * is parsed once into typed case classes so stage code is total and
  * mistakes (missing keys, wrong types) surface at parse time with a clear
  * error instead of mid-pipeline.
  */
final case class Plan(
    limits: Limits = Limits(),
    source: Source,
    transform: Transform = Transform(),
    load: Option[Load] = None,
    checks: Checks = Checks(),
    verify: VerifySpec = VerifySpec(),
    alerts: Alerts = Alerts(),
    schedule: Option[Schedule] = None)

/** reference templates.py:9, ops.py:20-24 — pre-flight input size cap. */
final case class Limits(maxInputBytes: Long = 1073741824L)

/** `source.kind` may be explicit or `auto` (inferred — reference
  * templates.py:39-48). Exactly one of the sub-specs is used. */
final case class Source(
    kind: String = "auto",
    csv: Option[CsvSource] = None,
    json: Option[JsonSource] = None,
    db: Option[DbSource] = None,
    api: Option[ApiSource] = None)

/** Single `path`, the flagship `paths {sales, features, stores}` triplet
  * (reference templates.py:59-82), or inline base64 content (reference
  * tools.py:23-27). */
final case class CsvSource(
    path: Option[String] = None,
    paths: Map[String, String] = Map.empty,
    contentB64: Option[String] = None)

/** reference tools.py:43-49; `jsonPath` is a dotted row selector — the
  * reference passes it to `eval` (tools.py:47 ⚠), here it is parsed safely. */
final case class JsonSource(path: String, jsonPath: Option[String] = None)

/** reference tools.py:51-56 — upstream SQL pushed to the source database. */
final case class DbSource(connStr: String, query: String)

/** reference tools.py:29-41 — REST GET with query params + row selector. */
final case class ApiSource(
    url: String,
    params: Map[String, String] = Map.empty,
    jsonPath: Option[String] = None)

final case class TransformStep(name: String, sql: String)

/** Ordered multi-step SQL (each step's output visible to later steps as a
  * view — reference templates.py:99-113) or single back-compat `sql`
  * (templates.py:114-121). */
final case class Transform(
    steps: Seq[TransformStep] = Nil,
    sql: Option[String] = None)

/** Pre-load DQ gate (reference tools.py:106-118, ops.py:34-47).
  * `disabled` is honored explicitly — the reference silently ignored it
  * (SURVEY.md §7.4; reference prompt_w_o_dq.txt:86). */
final case class Checks(
    minRows: Long = 1,
    nonnullCols: Seq[String] = Nil,
    freshnessMinutes: Option[Long] = None,
    timestampCol: Option[String] = None,
    disabled: Boolean = false)

/** Sink spec (reference templates.py:135-140, plan.yaml:31-39).
  * `to: parquet` + `partition_by` are engine extensions beyond the
  * reference's csv/postgres pair (the scale landing format). */
final case class Load(
    to: String = "postgres",
    connStr: Option[String] = None,
    table: Option[String] = None,
    mode: String = "append",
    keyCols: Seq[String] = Nil,
    filePath: Option[String] = None,
    includeHeader: Boolean = true,
    partitionBy: Seq[String] = Nil)

/** Post-load verification (reference templates.py:142-166). Unset
  * minRows/nonnullCols fall back to `checks` values (templates.py:149-150). */
final case class VerifySpec(
    minRows: Option[Long] = None,
    nonnullCols: Option[Seq[String]] = None,
    tsCol: Option[String] = None,
    maxLagMinutes: Long = 180)

final case class Alerts(
    onFail: Option[String] = None,
    onDqFail: Option[String] = None,
    webhookUrl: Option[String] = None)

final case class Schedule(cron: Option[String] = None)
