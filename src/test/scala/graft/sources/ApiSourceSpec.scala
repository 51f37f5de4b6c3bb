package graft.sources

import java.net.InetSocketAddress
import com.sun.net.httpserver.HttpServer
import graft.SparkSpec

/** Live REST-source tests against an in-process HTTP server (reference
  * tools.py:29-41 semantics: query params, 2xx gate, json_path row
  * selector, flatten). */
class ApiSourceSpec extends SparkSpec {

  private def withServer(body: String, status: Int = 200)(
      test: (String, () => Option[String]) => Unit): Unit = {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", ex => {
      seen.set(ex.getRequestURI.toString)
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/api",
      () => Option(seen.get()))
    finally server.stop(0)
  }

  test("fetchApi: params encoded, rows selected, structs flattened") {
    val payload =
      """{"data": {"products": [
        |  {"sku": 1, "info": {"name": "a", "price": 9.5}},
        |  {"sku": 2, "info": {"name": "b", "price": 3.25}}]}}""".stripMargin
    withServer(payload) { (url, seen) =>
      val df = Sources.fetchApi(spark, url,
        params = Map("apiKey" -> "k 1", "format" -> "json"),
        jsonPath = Some("data['products']"))
      assert(df.count() == 2)
      assert(df.columns.toSet == Set("sku", "info.name", "info.price"))
      val uri = seen().get
      assert(uri.contains("apiKey=k+1") || uri.contains("apiKey=k%201"))
      assert(uri.contains("format=json"))
    }
  }

  test("fetchApi: non-2xx fails loudly") {
    withServer("""{"err": true}""", status = 500) { (url, _) =>
      val e = intercept[RuntimeException](Sources.fetchApi(spark, url))
      assert(e.getMessage.contains("500"))
    }
  }

  test("engine end-to-end with api source") {
    val payload = """{"records": [{"id": 1, "v": 10.0}, {"id": 2, "v": 3.0}]}"""
    withServer(payload) { (url, _) =>
      val out = tmpDir("apiout").resolve("o.csv").toString
      val res = new graft.engine.Engine(spark).run(
        s"""source:
           |  kind: api
           |  api:
           |    url: $url
           |    json_path: $$.records
           |transform:
           |  sql: SELECT id, v FROM input_df WHERE v > 5 ORDER BY id
           |checks: {min_rows: 1}
           |load: {to: csv, file_path: $out}
           |""".stripMargin)
      assert(res.status == "ok", res.toJson)
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out))
      assert(lines.size == 2 && lines.get(1) == "1,10.0")
    }
  }

  test("engine end-to-end with inline base64 CSV source") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "sku,price\n1,9.5\n2,99.0\n".getBytes("UTF-8"))
    val out = tmpDir("b64out").resolve("o.csv").toString
    val res = new graft.engine.Engine(spark).run(
      s"""source:
         |  kind: csv
         |  csv: {content_b64: "$b64"}
         |transform:
         |  sql: SELECT sku, price FROM input_df WHERE price < 50
         |checks: {min_rows: 1}
         |load: {to: csv, file_path: $out}
         |""".stripMargin)
    assert(res.status == "ok", res.toJson)
    assert(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(out)).get(1) == "1,9.5")
  }
}
