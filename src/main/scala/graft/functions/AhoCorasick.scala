package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975) — the
  * single-pass dictionary scanner behind PII/keyword screening at
  * corpus scale: one linear walk over the text counts ALL (including
  * overlapping and nested) occurrences of every dictionary term at
  * once, where the naive approach re-scans the text once per term.
  * Goto/fail/output links are built once per dictionary (the
  * automaton rides into generated code via `addReferenceObj`); the
  * scan itself is codegen'd per row. Counting is over Unicode code
  * points of the lowercased text.
  *
  * The oracle has no automaton, so it replays the *specification*
  * instead: per pattern, count the positions `i` where
  * `substr(text, i, len(p)) = p` — the quadratic form the automaton
  * provably equals.
  */
case class AhoCountExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val automaton = new AhoCorasick(patterns)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "aho_count"

  override protected def nullSafeEval(input: Any): Any =
    automaton.countAll(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countAll($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoCountExpr =
    copy(child = newChild)
}

/** The compiled automaton: trie + BFS fail links + output links.
  * Serializable so the expression (and generated code's reference
  * object) ships to executors intact. */
class AhoCorasick(patterns: Seq[String]) extends Serializable {
  import scala.collection.mutable

  private val goto0 = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val out = mutable.ArrayBuffer(List.empty[Int])
  // build the trie
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    p.foreach { ch =>
      s = goto0(s).getOrElseUpdate(ch, {
        goto0 += mutable.Map.empty[Char, Int]
        out += Nil
        goto0.size - 1
      })
    }
    out(s) = pi :: out(s)
  }
  private val fail = new Array[Int](goto0.size)
  // BFS over trie depth: fail(child) = goto*(fail(parent), ch)
  locally {
    val queue = mutable.Queue.empty[Int]
    goto0(0).values.foreach { s => fail(s) = 0; queue.enqueue(s) }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto0(r).foreach { case (ch, s) =>
        queue.enqueue(s)
        var f = fail(r)
        while (f != 0 && !goto0(f).contains(ch)) f = fail(f)
        fail(s) = goto0(f).getOrElse(ch, 0)
        if (fail(s) == s) fail(s) = 0
        out(s) = out(s) ++ out(fail(s))
      }
    }
  }
  private val gotoArr: Array[Map[Char, Int]] = goto0.map(_.toMap).toArray
  private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray

  /** Counts of every pattern (dictionary order) in one pass. */
  def countAll(text: String): GenericArrayData = {
    val counts = new Array[Long](patterns.size)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      while (s != 0 && !gotoArr(s).contains(ch)) s = fail(s)
      s = gotoArr(s).getOrElse(ch, 0)
      val hits = outArr(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object AhoCountExpr {
  /** Column form: per-pattern occurrence counts (dictionary order). */
  def ahoCount(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      AhoCountExpr(ColumnBridge.expression(text), patterns))
}
