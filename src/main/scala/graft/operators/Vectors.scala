package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `ArrayType` columns, backed by the native codegen'd
  * expressions in [[graft.functions.NativeExprs]] (one tight loop per row;
  * higher-order `zip_with`+`aggregate` lambdas are interpreted per element
  * and were the dominant cost in the ANN/dedup benchmarks). Elements
  * promote to double before multiplying and accumulate in array order, so
  * results are IEEE-deterministic and match the unnest-zip SQL oracle. */
object Vectors {

  def dotProduct(a: Column, b: Column): Column =
    graft.functions.NativeExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.NativeExprs.cosineSim(a, b)
}
