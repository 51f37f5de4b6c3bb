package graft

/** Schema-drift canary (r6 verdict ask): construct and analyze EVERY
  * declared query against the current sf0.001 fixtures, so that the next
  * testdata regeneration (e.g. the r6 `events.ts` int64-nanos →
  * timestamp[us] drift, which broke 17 queries at analysis time) fails in
  * ONE named place with the complete list of affected queries, instead of
  * surfacing as scattered suite failures or — worse — silently shrinking
  * the correctness artifact.
  *
  * `.schema` forces analysis (resolution + type-checking) without
  * executing the lazy batch plans; query builders with eager parts
  * (streaming twins, checkpointed iterative graph loops) do run, which is
  * acceptable at sf0.001 and still exercises exactly the construction
  * path Verify.scala runs per round.
  */
class SchemaCanarySpec extends SparkSpec {

  test("every fixture table loads with a non-empty schema") {
    Tables.all.foreach { t =>
      val df = Tables.load(spark, sf, t)
      assert(df.schema.nonEmpty, s"$t: empty schema")
    }
  }

  test("all declared queries construct and analyze on current fixtures") {
    // eager builders (streaming twins, iterative collect loops, artifact
    // writes) fully execute here; a per-query deadline keeps one hung
    // stream from wedging the whole canary — it fails loudly by name
    // instead (r7 ADVICE item). The worker thread may linger past the
    // deadline; acceptable in a test JVM.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val deadline = 180.seconds
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Await.result(Future { fn(spark, sf).schema }, deadline); None }
        catch {
          case _: java.util.concurrent.TimeoutException =>
            Some(s"$name: exceeded the $deadline canary deadline (hung?)")
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            Some(s"$name: ${msg.linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed to construct/analyze:\n" +
        failures.mkString("\n"))
  }
}
