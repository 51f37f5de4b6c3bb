package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The gzip shard codec: round-trip identity (scalar + as DataFrame
  * columns inside codegen), RFC 1952 framing checks (magic bytes,
  * loud CRC failure on a corrupted member), and multi-line JSONL shard
  * content survival including non-ASCII UTF-8. */
class ShardCodecSpec extends SparkSpec {
  import spark.implicits._

  private def gz(s: String): Array[Byte] =
    ShardCodec.gzipUtf8(UTF8String.fromString(s))

  test("scalar round-trip incl. UTF-8 and embedded newlines") {
    for (s <- Seq("", "a", "hello world", "line1\nline2\nline3",
        "unicode: é中文 end", "x" * 100000))
      assert(ShardCodec.gunzipUtf8(gz(s)).toString == s)
  }

  test("output is RFC 1952 framed (magic 1f 8b, deflate method)") {
    val b = gz("payload")
    assert((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b && b(2) == 8)
  }

  test("a corrupted member fails loudly (CRC/format check)") {
    val b = gz("the quick brown fox jumps over the lazy dog, repeatedly")
    // flip a byte in the compressed body (past the 10-byte header)
    val bad = b.clone(); bad(12) = (bad(12) ^ 0x55).toByte
    intercept[java.io.IOException](ShardCodec.gunzipUtf8(bad))
    // truncation (lost trailer) also fails
    intercept[Exception](ShardCodec.gunzipUtf8(b.dropRight(5)))
  }

  test("column round-trip under codegen: shard → gzip → gunzip → parse") {
    val df = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta eps"))
      .toDF("doc_id", "text")
    val shard = df.select(to_json(struct($"doc_id", $"text")).as("line"))
      .agg(array_join(array_sort(collect_list($"line")), "\n").as("jsonl"))
      .select(ShardExprs.gzipUtf8($"jsonl").as("payload"))
    val back = shard
      .select(explode(split(ShardExprs.gunzipUtf8($"payload"), "\n")).as("l"))
      .select(get_json_object($"l", "$.doc_id").cast("long").as("doc_id"),
        get_json_object($"l", "$.text").as("text"))
      .orderBy($"doc_id")
      .collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta eps")))
  }
}
