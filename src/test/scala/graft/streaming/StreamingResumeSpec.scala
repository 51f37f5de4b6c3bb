package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Checkpoint-recovery semantics: the e-family proves batch/stream result
  * parity through memory sinks; this spec pins the *operational* half a
  * production stream relies on — a file-sink query killed and restarted
  * on the same checkpoint processes only the files that arrived since,
  * and the sink ends exactly-once: no duplicates, no gaps, and an idle
  * restart appends nothing. */
class StreamingResumeSpec extends SparkSpec {
  import spark.implicits._

  test("file-sink stream resumes from its checkpoint exactly-once") {
    val srcDir = tmpDir("resume_src").toString
    val outDir = tmpDir("resume_out").toString
    val chkDir = tmpDir("resume_chk").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", length($"text").cast("long").as("n"))
    val schema = docs.schema

    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .withColumn("n2", $"n" * 2)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", chkDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // wave 1 arrives, stream runs and is killed
    docs.filter($"doc_id" % 2 === 0).write.mode("append").parquet(srcDir)
    drain()
    val afterWave1 = spark.read.parquet(outDir).count()
    assert(afterWave1 == docs.filter($"doc_id" % 2 === 0).count())

    // wave 2 arrives while the query is down; a NEW query on the same
    // checkpoint must pick up exactly the new files
    docs.filter($"doc_id" % 2 === 1).write.mode("append").parquet(srcDir)
    drain()
    val out = spark.read.parquet(outDir).cache()
    assert(out.count() == docs.count(), "no gaps after resume")
    assert(out.select($"doc_id").distinct().count() == docs.count(),
      "no duplicates after resume")

    // idle restart: nothing new arrived, nothing may be re-emitted
    drain()
    assert(spark.read.parquet(outDir).count() == docs.count(),
      "an idle restart must be a no-op")
    out.unpersist()
  }
}
