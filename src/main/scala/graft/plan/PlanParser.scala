package graft.plan

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

/** YAML plan text → [[Plan]].
  *
  * Replicates the reference's pre-processing pipeline: markdown fence
  * stripping and `mel <<EOF … EOF` unwrapping (reference templates.py:25-34),
  * `$ENV` placeholder expansion (reference runtime.py:15), and `kind: auto`
  * source inference (reference templates.py:39-48) — but parses into a typed
  * ADT with strict errors instead of indexing a raw dict.
  */
object PlanParser {

  final class PlanParseException(msg: String) extends RuntimeException(msg)

  private val fenceRe =
    """(?is)```(?:yaml|yml)?\s*\n(.*?)\n```""".r
  private val heredocRe =
    """(?s)^mel <<EOF\n?(.*)\nEOF\s*$""".r
  private val envRe = """\$\{(\w+)\}|\$(\w+)""".r

  /** Strip ```yaml fences / `mel <<EOF` wrappers (templates.py:25-34). */
  def stripWrappers(text: String): String = {
    val s0 = Option(text).getOrElse("").trim
    val s1 = fenceRe.findFirstMatchIn(s0).map(_.group(1).trim).getOrElse(s0)
    heredocRe.findFirstMatchIn(s1).map(_.group(1)).getOrElse(s1)
  }

  /** `$VAR` / `${VAR}` expansion against the given environment; unknown
    * variables are left verbatim (matches os.path.expandvars). */
  def expandEnv(text: String, env: Map[String, String] = sys.env): String =
    envRe.replaceAllIn(text, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      java.util.regex.Matcher.quoteReplacement(env.getOrElse(name, m.matched))
    })

  /** `kind: auto` heuristics (reference templates.py:39-48): db conn-str →
    * db; http(s) url → api; .csv path → csv; .json/.ndjson path → json;
    * default api. */
  def inferKind(src: Source): String =
    if (src.kind != "auto") src.kind
    else if (src.db.exists(_.connStr.nonEmpty)) "db"
    else if (src.api.exists(a => a.url.startsWith("http://") || a.url.startsWith("https://"))) "api"
    else if (src.csv.exists(_.path.exists(_.toLowerCase.endsWith(".csv"))) ||
             src.csv.exists(_.paths.nonEmpty)) "csv"
    else if (src.json.exists(j => j.path.toLowerCase.endsWith(".json") ||
             j.path.toLowerCase.endsWith(".ndjson"))) "json"
    else "api"

  def parse(text: String, env: Map[String, String] = sys.env): Plan = {
    val cleaned = expandEnv(stripWrappers(text), env)
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions()))
    val doc = yaml.load[Object](cleaned) match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
      case other =>
        throw new PlanParseException(
          s"Plan YAML must be a mapping; got ${if (other == null) "null" else other.getClass.getSimpleName}")
    }
    fromMap(doc)
  }

  // ── untyped map → ADT ────────────────────────────────────────────────────

  private def asMap(v: Any): Map[String, Any] = v match {
    case null => Map.empty
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> (x: Any) }.toMap
    case other => throw new PlanParseException(s"expected mapping, got $other")
  }

  private def asSeq(v: Any): Seq[Any] = v match {
    case null => Nil
    case l: java.util.List[_] => l.asScala.toSeq
    case other => throw new PlanParseException(s"expected list, got $other")
  }

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case v if v != null => String.valueOf(v) }

  private def lng(m: Map[String, Any], k: String): Option[Long] =
    m.get(k).collect {
      case n: Number => n.longValue()
      case s: String if s.nonEmpty => s.trim.toLong
    }

  private def bool(m: Map[String, Any], k: String): Option[Boolean] =
    m.get(k).collect {
      case b: java.lang.Boolean => b.booleanValue()
      case s: String => s.trim.toBoolean
    }

  private def strSeq(m: Map[String, Any], k: String): Option[Seq[String]] =
    m.get(k).map(v => asSeq(v).map(String.valueOf(_)))

  private def strMap(v: Any): Map[String, String] =
    asMap(v).map { case (k, x) => k -> String.valueOf(x) }

  private[plan] def fromMap(doc: Map[String, Any]): Plan = {
    val limits = Limits(
      lng(asMap(doc.getOrElse("limits", null)), "max_input_bytes")
        .getOrElse(1073741824L))

    val srcMap = asMap(doc.getOrElse("source",
      throw new PlanParseException("plan requires a 'source' section")))
    val source = Source(
      kind = str(srcMap, "kind").getOrElse("auto"),
      csv = srcMap.get("csv").map(asMap).map { c =>
        CsvSource(
          path = str(c, "path"),
          paths = c.get("paths").map(strMap).getOrElse(Map.empty),
          contentB64 = str(c, "content_b64"))
      },
      json = srcMap.get("json").map(asMap).map { j =>
        JsonSource(
          path = str(j, "path").getOrElse(
            throw new PlanParseException("json source requires 'path'")),
          jsonPath = str(j, "json_path").filter(_.nonEmpty))
      },
      db = srcMap.get("db").map(asMap).map { d =>
        DbSource(
          connStr = str(d, "conn_str").getOrElse(
            throw new PlanParseException("db source requires 'conn_str'")),
          query = str(d, "query").getOrElse(
            throw new PlanParseException("db source requires 'query'")))
      },
      api = srcMap.get("api").map(asMap).map { a =>
        ApiSource(
          url = str(a, "url").getOrElse(
            throw new PlanParseException("api source requires 'url'")),
          params = a.get("params").map(strMap).getOrElse(Map.empty),
          jsonPath = str(a, "json_path").filter(_.nonEmpty))
      })

    val trMap = asMap(doc.getOrElse("transform", null))
    val transform = Transform(
      steps = trMap.get("steps").map(asSeq).getOrElse(Nil).map { st =>
        val m = asMap(st)
        TransformStep(
          name = str(m, "name").getOrElse(
            throw new PlanParseException("transform step requires 'name'")),
          sql = str(m, "sql").getOrElse(
            throw new PlanParseException("transform step requires 'sql'")))
      },
      sql = str(trMap, "sql"))

    val load = doc.get("load").map(asMap).filter(_.nonEmpty).map { l =>
      Load(
        to = str(l, "to").getOrElse("postgres"),
        connStr = str(l, "conn_str"),
        table = str(l, "table"),
        mode = str(l, "mode").getOrElse("append"),
        keyCols = strSeq(l, "key_cols").getOrElse(Nil),
        filePath = str(l, "file_path"),
        includeHeader = bool(l, "include_header").getOrElse(true),
        partitionBy = strSeq(l, "partition_by").getOrElse(Nil))
    }

    val ckMap = asMap(doc.getOrElse("checks", null))
    val checks = Checks(
      minRows = lng(ckMap, "min_rows").getOrElse(1L),
      nonnullCols = strSeq(ckMap, "nonnull_cols").getOrElse(Nil),
      freshnessMinutes = lng(ckMap, "freshness_minutes"),
      timestampCol = str(ckMap, "timestamp_col").filter(_.nonEmpty),
      disabled = bool(ckMap, "disabled").getOrElse(false))

    val vfMap = asMap(doc.getOrElse("verify", null))
    val verify = VerifySpec(
      minRows = lng(vfMap, "min_rows"),
      nonnullCols = strSeq(vfMap, "nonnull_cols"),
      tsCol = str(vfMap, "ts_col").filter(_.nonEmpty),
      maxLagMinutes = lng(vfMap, "max_lag_minutes").getOrElse(180L))

    val alMap = asMap(doc.getOrElse("alerts", null))
    val alerts = Alerts(
      onFail = str(alMap, "on_fail"),
      onDqFail = str(alMap, "on_dq_fail"),
      webhookUrl = str(alMap, "webhook_url"))

    val schedule = doc.get("schedule").map(asMap).filter(_.nonEmpty)
      .map(sm => Schedule(str(sm, "cron")))

    Plan(limits, source, transform, load, checks, verify, alerts, schedule)
  }
}
