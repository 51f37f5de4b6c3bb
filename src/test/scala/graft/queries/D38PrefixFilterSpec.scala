package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Text

/** Pins the round-12 d38 rewrite: the Bayardo-style containment prefix
  * filter must be LOSSLESS — the pruned plan's output equals the
  * original unpruned shared-shingle self-join row for row. Also pins
  * the bound arithmetic the filter relies on. */
class D38PrefixFilterSpec extends SparkSpec {

  test("prefix-filtered d38 equals the unpruned formulation at sf0.001") {
    val pruned = Round76Queries.d38_containment(spark, sf)
      .collect().map(_.toSeq).toSet
    // the ORIGINAL unpruned plan, inline
    val sh = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(Text.shingles(col("text"), 3))).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter_sh"))
    val full = inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter_sh"), col("na"), col("nb"),
        expr("(inter_sh * 10000) div na").as("cont_ab_bp"),
        expr("(inter_sh * 10000) div nb").as("cont_ba_bp"),
        (col("inter_sh") === col("na") || col("inter_sh") === col("nb"))
          .as("is_full"))
      .filter(greatest(col("cont_ab_bp"), col("cont_ba_bp")) >= 8000)
      .collect().map(_.toSeq).toSet
    assert(full.nonEmpty, "fixture must produce containment pairs")
    assert(pruned === full,
      s"prefix filter changed the result: pruned ${pruned.size} vs " +
        s"unpruned ${full.size}")
  }

  test("the integer prefix bound matches the threshold semantics") {
    // floor(inter*10000/n) >= 8000  <=>  inter >= ceil(0.8*n); the
    // prefix size n - ceil(0.8n) + 1 = n - (4n+4) div 5 + 1
    for (n <- 1 to 200; inter <- Seq(0, 1, n / 2, (4 * n + 4) / 5 - 1,
        (4 * n + 4) / 5, n)) {
      if (inter >= 0 && inter <= n) {
        val gate = (inter.toLong * 10000) / n >= 8000
        val ceil08 = (4 * n + 4) / 5
        assert(gate === (inter >= ceil08), s"n=$n inter=$inter")
      }
    }
  }
}
