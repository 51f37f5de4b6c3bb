package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `ArrayType` columns as pure column expressions
  * (`zip_with` + `aggregate` are codegen'd higher-order functions — no UDF,
  * no boxing per element beyond the array itself). Elements are cast to
  * double before multiplying so accumulation is IEEE-deterministic in array
  * order. */
object Vectors {

  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (norm(a) * norm(b))
}
