package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint via Karp-Rabin rolling hash: the minimum of all
  * k-gram window hashes over the Unicode *codepoints* (a 1-fingerprint
  * winnowing scheme). Hashing codepoints rather than UTF-8 bytes keeps the
  * value recomputable by a SQL oracle via `ord(substr(s, i, 1))` for any
  * text, not just ASCII. Near-identical documents that share any
  * k-codepoint run with the minimal hash collide, making this a cheap
  * pre-cluster key for dedup.
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * participates in whole-stage codegen (no UDF serialization, no row
  * boxing) — the preferred extension point when built-ins can't express
  * the computation (SURVEY.md §7.3 preference order).
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash.compute($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  // polynomial base/modulus: Mersenne prime 2^61-1 keeps products in range
  // via the standard fold (hi/lo split not needed at base < 2^31).
  private val B = 1000003L
  /** Mersenne-prime modulus 2^61-1, shared by every portable hash here. */
  val M: Long = (1L << 61) - 1

  /** Static forwarder target for generated Java code. */
  def compute(s: String, k: Int): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    // hash of first window
    var h = 0L
    var i = 0
    while (i < kk) { h = mulmod(h, B) + cps(i); if (h >= M) h -= M; i += 1 }
    // B^(kk-1) mod M for the roll-off term
    var pow = 1L
    i = 1
    while (i < kk) { pow = mulmod(pow, B); i += 1 }
    var min = h
    i = kk
    while (i < n) {
      val off = mulmod(cps(i - kk).toLong, pow)
      h = h - off
      if (h < 0) h += M
      h = mulmod(h, B) + cps(i)
      if (h >= M) h -= M
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** (a*b) mod 2^61-1 via 128-bit split — overflow-safe for a,b < 2^61. */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold: value = hi*2^64 + lo; 2^64 ≡ 8 (mod 2^61-1)
    var r = (lo & M) + (lo >>> 61) + ((hi << 3) & M) + (hi >>> 58)
    while (r >= M) r -= M
    r
  }

  /** Column form. */
  def rollingMinHash(c: Column, k: Int = 8): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(c), k))
}
