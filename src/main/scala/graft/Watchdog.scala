package graft

/** Shared watchdog-config parsing for Verify and Bench (round-12, per
  * advisor): the per-query hang watchdogs are implemented as
  * `Thread.join(sec * 1000)`, so a configured value of 0 means "wait
  * forever" — silently disabling the exact protection the knob tunes and
  * reinstating the r10 whole-artifact hang — and a non-numeric value would
  * throw NumberFormatException before any query ran. Both degrade to the
  * default, loudly, instead. */
object Watchdog {
  def parseTimeoutSec(raw: Option[String], default: Long, who: String): Long =
    raw match {
      case None => default
      case Some(s) => s.trim.toLongOption match {
        case Some(v) if v > 0 => v
        case other =>
          System.err.println(s"[$who] SPARK_GRAFT_QUERY_TIMEOUT_SEC=" +
            s"'$s' is ${if (other.isEmpty) "not a number" else "not > 0"}; " +
            s"using default ${default}s (0 would disable the hang watchdog)")
          default
      }
    }
}
