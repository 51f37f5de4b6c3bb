package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key ORDER-DEPENDENT stateful scans — the fold shapes window
  * functions cannot express (a running aggregate whose next value depends
  * non-linearly on its previous value, e.g. a clamp).
  *
  * Execution shape is the classic secondary sort: hash-repartition by key,
  * sort each partition by (key, order...), then ONE linear `mapPartitions`
  * pass carrying O(1) state per key. No per-key materialization (a
  * `groupByKey().mapGroups` would buffer each key's rows; here keys stream
  * through in order), no driver involvement, and the shuffle is the same
  * single exchange a window over the key would pay — so a 100 TB event log
  * scans at full parallelism, bounded by the largest single partition, not
  * the largest key.
  */
object OrderedScan {

  /** Clamped (floor-at-zero) running balance per key: starting from 0,
    * bal ← max(bal + delta, 0) in event order — the inventory/credit
    * semantics ("stock cannot go negative") that plain SUM() OVER cannot
    * express because the clamp makes the recurrence non-associative.
    *
    * Input columns are Spark SQL expressions; `orderCols` must be a
    * deterministic total order within each key (include a unique
    * tiebreaker). Returns one row per key:
    * (key, n_steps, n_clamps, max_balance, final_balance) — n_clamps
    * counts steps where the clamp engaged (bal + delta < 0), max_balance
    * is the maximum post-step balance. Exact BIGINT arithmetic. */
  /** Integer EWMA with α = 1/2 per key: s ← (s + x) div 2 in order
    * (s₁ = x₁) — exponential smoothing kept on the integer lattice so
    * both engines replay it exactly. Like the clamp, the halving makes
    * the recurrence non-associative (truncation loses low bits at every
    * step), so no window SUM expresses it; same secondary-sort execution
    * shape as [[cappedBalance]]. Returns one row per key:
    * (key, n_steps, max_ewma, final_ewma). */
  def halvingEwma(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(keyCol.cast("string").as("k") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"o$i") } :+
        valueCol.cast("long").as("x"): _*)
      .repartition(col("k"))
      .sortWithinPartitions(col("k") +: orderCols.indices.map(i => col(s"o$i")): _*)
      .select(col("k"), col("x"))
      .as[(String, Long)]
    prepared.mapPartitions { it =>
      new Iterator[(String, Long, Long, Long)] {
        private var pending: Option[(String, Long, Long, Long)] = None
        private var cur = Option.empty[String]
        private var s, mx, steps = 0L
        private var first = true
        private def emit() = (cur.get, steps, mx, s)
        private def reset(k: String): Unit = {
          cur = Some(k); s = 0L; mx = Long.MinValue; steps = 0L; first = true
        }
        private def step(x: Long): Unit = {
          s = if (first) x else (s + x) / 2
          first = false
          if (s > mx) mx = s
          steps += 1
        }
        override def hasNext: Boolean = pending.nonEmpty || {
          while (it.hasNext && pending.isEmpty) {
            val (k, x) = it.next()
            if (cur.contains(k)) step(x)
            else {
              if (cur.nonEmpty) pending = Some(emit())
              reset(k); step(x)
            }
          }
          if (pending.isEmpty && cur.nonEmpty) { pending = Some(emit()); cur = None }
          pending.nonEmpty
        }
        override def next(): (String, Long, Long, Long) = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending.get; pending = None; r
        }
      }
    }.toDF("k", "n_steps", "max_ewma", "final_ewma")
  }

  def cappedBalance(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      deltaCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(keyCol.cast("long").as("k") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"o$i") } :+
        deltaCol.cast("long").as("delta"): _*)
      .repartition(col("k"))
      .sortWithinPartitions(col("k") +: orderCols.indices.map(i => col(s"o$i")): _*)
      .select(col("k"), col("delta"))
      .as[(Long, Long)]
    prepared.mapPartitions { it =>
      new Iterator[(Long, Long, Long, Long, Long)] {
        private var pending: Option[(Long, Long, Long, Long, Long)] = None
        private var cur = Option.empty[Long] // current key
        private var bal, mx, clamps, steps = 0L
        private def emit(): (Long, Long, Long, Long, Long) =
          (cur.get, steps, clamps, mx, bal)
        private def reset(k: Long): Unit = {
          cur = Some(k); bal = 0L; mx = 0L; clamps = 0L; steps = 0L
        }
        private def step(delta: Long): Unit = {
          val next = bal + delta
          if (next < 0) { clamps += 1; bal = 0L } else bal = next
          if (bal > mx) mx = bal
          steps += 1
        }
        override def hasNext: Boolean = pending.nonEmpty || {
          while (it.hasNext && pending.isEmpty) {
            val (k, d) = it.next()
            if (cur.contains(k)) step(d)
            else {
              if (cur.nonEmpty) pending = Some(emit())
              reset(k); step(d)
            }
          }
          if (pending.isEmpty && cur.nonEmpty) { pending = Some(emit()); cur = None }
          pending.nonEmpty
        }
        override def next(): (Long, Long, Long, Long, Long) = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending.get; pending = None; r
        }
      }
    }.toDF("k", "n_steps", "n_clamps", "max_balance", "final_balance")
  }

  /** Integer Holt linear-trend smoothing with α = β = 1/2 per key
    * (Holt 1957, public): level/trend state folded in order,
    *   l₁ = x₁, b₁ = 0;  lₜ = trunc((xₜ + lₜ₋₁ + bₜ₋₁) / 2),
    *   bₜ = trunc((bₜ₋₁ + (lₜ − lₜ₋₁)) / 2)
    * — all divisions TRUNCATE toward zero (JVM `/`), which is exactly
    * what DuckDB's integer `//` does (measured: -3 // 2 = -1, i.e.
    * truncation — its float `//` floors, its integer one does not), so
    * the recursive-CTE oracle replays negative trends bit for bit. The
    * two-component state is non-associative twice over (each halving
    * truncates), the third fold shape on this operator after the clamp
    * and the EWMA; identical secondary-sort execution. Returns one row
    * per key: (k, n_steps, final_level, final_trend, max_level), with
    * the one-step forecast being final_level + final_trend. */
  def holtTrend(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(keyCol.cast("long").as("k") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"o$i") } :+
        valueCol.cast("long").as("x"): _*)
      .repartition(col("k"))
      .sortWithinPartitions(col("k") +: orderCols.indices.map(i => col(s"o$i")): _*)
      .select(col("k"), col("x"))
      .as[(Long, Long)]
    prepared.mapPartitions { it =>
      new Iterator[(Long, Long, Long, Long, Long)] {
        private var pending: Option[(Long, Long, Long, Long, Long)] = None
        private var cur = Option.empty[Long]
        private var l, b, mx, steps = 0L
        private var first = true
        private def emit() = (cur.get, steps, l, b, mx)
        private def reset(k: Long): Unit = {
          cur = Some(k); l = 0L; b = 0L; mx = Long.MinValue; steps = 0L
          first = true
        }
        private def step(x: Long): Unit = {
          if (first) { l = x; b = 0L; first = false }
          else {
            val l2 = (x + l + b) / 2
            b = (b + (l2 - l)) / 2
            l = l2
          }
          if (l > mx) mx = l
          steps += 1
        }
        override def hasNext: Boolean = pending.nonEmpty || {
          while (it.hasNext && pending.isEmpty) {
            val (k, x) = it.next()
            if (cur.contains(k)) step(x)
            else {
              if (cur.nonEmpty) pending = Some(emit())
              reset(k); step(x)
            }
          }
          if (pending.isEmpty && cur.nonEmpty) { pending = Some(emit()); cur = None }
          pending.nonEmpty
        }
        override def next(): (Long, Long, Long, Long, Long) = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending.get; pending = None; r
        }
      }
    }.toDF("k", "n_steps", "final_level", "final_trend", "max_level")
  }
}
