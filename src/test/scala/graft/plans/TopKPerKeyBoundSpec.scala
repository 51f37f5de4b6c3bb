package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, UnsafeProjection}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import graft.SparkSpec

/** Memory/output contract of the custom top-k operator (r6 verdict ask
  * #8): the partial phase holds at most distinctKeys·k rows per partition
  * (a hash-aggregate's footprint) and therefore the exchange carries at
  * most partitions·distinctKeys·k rows — pinned by executing the partial
  * phase alone and counting, not just by the Scaladoc. */
class TopKPerKeyBoundSpec extends SparkSpec {

  private val kAttr = AttributeReference("k", LongType)()
  private val vAttr = AttributeReference("v", LongType)()
  private val rowProj =
    UnsafeProjection.create(Array[DataType](LongType, LongType))

  private def rows(n: Int, key: Int => Long): Iterator[InternalRow] =
    (0 until n).iterator.map(i =>
      rowProj(InternalRow(key(i), i.toLong)).asInstanceOf[InternalRow])

  test("boundedTopK emits exactly min(count, k) rows per key") {
    val n = 100000; val keys = 20; val k = 3
    val out = TopKPerKeyExec.boundedTopK(rows(n, _ % keys),
      Seq(kAttr), vAttr, vAttr, k, Seq(kAttr, vAttr)).toSeq
    assert(out.size == keys * k,
      s"100k skewed rows must reduce to keys·k = ${keys * k}, " +
        s"got ${out.size}")
    // and they are the RIGHT rows: the k largest v per key
    val byKey = out.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until keys).foreach { j =>
      val expect = (1 to k).map(m => (n - m * keys + j).toLong).toSet
      assert(byKey(j.toLong) == expect,
        s"key $j kept ${byKey(j.toLong)}, expected $expect")
    }
  }

  test("high-cardinality keys degrade to the hash-aggregate worst case") {
    // every row its own key: nothing can be pruned — the bound is
    // distinctKeys·k ≥ n, and the operator must keep all rows (same
    // state growth as a groupBy over the same key, never worse)
    val n = 5000
    val out = TopKPerKeyExec.boundedTopK(rows(n, _.toLong),
      Seq(kAttr), vAttr, vAttr, 2, Seq(kAttr, vAttr)).toSeq
    assert(out.size == n)
  }

  test("planned partial phase bounds the exchange to partitions·keys·k rows") {
    // concrete (non-AQE) physical plan so the partial node is reachable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val parts = 8; val keys = 20; val k = 3
      val df = spark.range(0, 20000)
        .select((col("id") % keys).as("key"), col("id").as("v"))
        .repartition(parts)
      val res = graft.operators.TopK.perKey(df, Seq("key"), "v", "v", k)
      val partial = res.queryExecution.executedPlan.collectFirst {
        case t: TopKPerKeyExec if t.partial => t
      }.getOrElse(fail("partial TopKPerKeyExec not planned"))
      val shuffled = partial.execute().count()
      assert(shuffled <= parts.toLong * keys * k,
        s"exchange input must be ≤ partitions·keys·k = " +
          s"${parts * keys * k}, got $shuffled")
      // and the final result still matches the window formulation
      val w = Window.partitionBy(col("key"))
        .orderBy(col("v").desc, col("v").asc)
      val expect = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
      assert(res.exceptAll(expect).isEmpty && expect.exceptAll(res).isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
