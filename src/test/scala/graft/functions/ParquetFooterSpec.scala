package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the thrift-compact parquet footer reader: real driver-shipped
  * files against constants independently produced by DuckDB's
  * parquet_metadata() (recorded in the comments), plus protocol-level
  * vectors for the compact-encoding corners the real footers may not
  * exercise (long-form field ids, long-form list sizes, map skip). */
class ParquetFooterSpec extends AnyFunSuite {

  private def readFile(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  test("nation.parquet parses to DuckDB's parquet_metadata values") {
    // duckdb> SELECT ... FROM parquet_metadata('.../sf0.01/nation.parquet')
    //   n_nationkey: nv=25 comp=194 unc=189 dpo=123 dict=4
    //   n_name:      nv=25 comp=221 unc=400 dpo=434 dict=284
    //   n_regionkey: nv=25 comp=103 unc=99  dpo=619 dict=583
    val meta = ParquetFooter.parse(
      readFile("/root/testdata/sf0.01/nation.parquet"))
    assert(meta.numRows === 25L)
    assert(meta.groups.length === 1)
    val g = meta.groups.head
    assert(g.numRows === 25L)
    assert(g.chunks.map(_.pathInSchema)
      === Seq("n_nationkey", "n_name", "n_regionkey"))
    val c0 = g.chunks(0)
    assert(c0.numValues === 25L)
    assert(c0.compressed === 194L)
    assert(c0.uncompressed === 189L)
    assert(c0.dataPageOffset === 123L)
    assert(c0.dictPageOffset === 4L)
    assert(c0.codec === "SNAPPY")
    assert(c0.encodings === "PLAIN, RLE, RLE_DICTIONARY")
    val c1 = g.chunks(1)
    assert((c1.compressed, c1.uncompressed, c1.dataPageOffset,
      c1.dictPageOffset) === ((221L, 400L, 434L, 284L)))
  }

  test("nested list columns render DuckDB-style comma paths") {
    val meta = ParquetFooter.parse(
      readFile("/root/testdata/sf0.01/embeddings.parquet"))
    assert(meta.groups.head.chunks.map(_.pathInSchema)
      .contains("embedding, list, element"))
  }

  test("every driver-shipped file parses and sums to its table size") {
    for (name <- graft.Tables.all) {
      val meta = ParquetFooter.parse(
        readFile(s"/root/testdata/sf0.01/$name.parquet"))
      assert(meta.numRows > 0, name)
      assert(meta.groups.map(_.numRows).sum === meta.numRows, name)
      for (grp <- meta.groups; ch <- grp.chunks) {
        assert(ch.numValues > 0, s"$name/${ch.pathInSchema}")
        assert(ch.compressed > 0 && ch.uncompressed > 0,
          s"$name/${ch.pathInSchema}")
      }
    }
  }

  test("bad magic fails loudly") {
    val b = readFile("/root/testdata/sf0.01/nation.parquet").clone()
    b(b.length - 1) = 'X'
    intercept[IllegalArgumentException] { ParquetFooter.parse(b) }
  }

  test("compact protocol corners: long-form ids, big lists, map skip") {
    // synthetic file whose FileMetaData carries, after num_rows=77,
    // only fields parse() must SKIP generically — exercising the
    // compact-encoding corners real pyarrow footers may not:
    //   field 5   i64 (short form, delta 2 after field 3)
    //   field 200 i64 (LONG-form id: header 0x06, zigzag field id)
    //   field 201 list<i64> with size 20 (long-size form, 0xF6 header)
    //   field 202 map<i64,i64> with 2 entries
    //   field 203 i64 (delta 1) — must still be reached after the skips
    val fm = new java.io.ByteArrayOutputStream
    def vint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { fm.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      fm.write(v.toInt)
    }
    def zz(v: Long): Unit = vint((v << 1) ^ (v >> 63))
    fm.write(0x36); zz(77) // field 3 (i64): num_rows = 77
    fm.write(0x26); zz(21) // field 5 (i64): skipped
    fm.write(0x06); zz(200); zz(7) // field 200, long-form id
    fm.write(0x19); fm.write(0xF6) // field 201: list, long-size form
    vint(20)
    for (k <- 0 until 20) zz(k)
    fm.write(0x1B); vint(2); fm.write(0x66) // field 202: map 2×(i64,i64)
    zz(1); zz(2); zz(3); zz(4)
    fm.write(0x16); zz(99) // field 203 (i64)
    fm.write(0x00) // STOP
    val fmB = fm.toByteArray
    val f = new java.io.ByteArrayOutputStream
    f.write("PAR1".getBytes)
    f.write(fmB)
    f.write(Array[Byte]((fmB.length & 0xFF).toByte,
      ((fmB.length >> 8) & 0xFF).toByte, 0, 0))
    f.write("PAR1".getBytes)
    val meta = ParquetFooter.parse(f.toByteArray)
    assert(meta.numRows === 77L)
    assert(meta.groups.isEmpty)
  }
}
