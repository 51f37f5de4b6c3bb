package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-127 operators, pinned at sf0.001. */
class Round127Spec extends SparkSpec {

  test("m50: EXIF fields parse from real APP1 bytes on every doc") {
    val rows = Round127Queries.m50_exif_extract(spark, sf).collect()
    assert(rows.length ===
      graft.Tables.load(spark, sf, "documents").count().toInt)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("orientation") === (1 + id % 8).toInt)
      assert(r.getAs[String]("make") === s"graft-cam-${id % 5}")
      val dt = r.getAs[String]("datetime")
      assert(dt.matches("""\d{4}:\d{2}:\d{2} \d{2}:\d{2}:\d{2}"""), dt)
      assert(r.getAs[Int]("app1_bytes") === 90)
      assert(r.getAs[Int]("n_segments") === 7)
      // the pixel plane survived the splice: 1024 px, each in [0, 255]
      assert(r.getAs[Long]("sum_v") >= 0L &&
        r.getAs[Long]("sum_v") <= 1024L * 255)
    }
  }

  test("m51: the census walks VBR frames and syncsafe tags exactly") {
    val rows = Round127Queries.m51_mp3_census(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("title") === s"track-${id % 1000}")
      assert(r.getAs[String]("artist") === s"artist-${id % 97}")
      assert(r.getAs[Int]("n_frames") === (5 + id % 4).toInt)
      // ~26–38 ms/frame at 44.1 kHz
      val d = r.getAs[Long]("duration_ms")
      assert(d === r.getAs[Int]("n_frames").toLong * 1152 * 1000 / 44100)
      // VBR: byte totals vary with the planted bitrate walk, bounded by
      // the table extremes
      val bytes = r.getAs[Long]("audio_bytes")
      val n = r.getAs[Int]("n_frames")
      assert(bytes >= n * 104L && bytes <= n * 1045L, s"doc $id: $bytes")
    }
    // bitrates genuinely vary across docs (the VBR walk is not constant)
    assert(rows.map(_.getAs[Long]("sum_kbps")).distinct.length > 3)
  }
}
