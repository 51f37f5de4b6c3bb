package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property test of the Misra-Gries mergeable summary: for ANY input
  * stream, ANY partitioning of it, and ANY merge tree order, every key
  * with true count > n/(capacity+1) must survive to the final summary.
  * This is the guarantee the exact recount pass (a2) builds on — if it
  * ever failed, the "exact" heavy-hitter result would silently drop keys.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def runPartitioned(agg: MisraGriesAgg, keys: Seq[Long],
      rnd: scala.util.Random): Seq[Long] = {
    val nParts = 1 + rnd.nextInt(8)
    // random partition assignment, preserving per-partition arrival order
    val parts = Array.fill(nParts)(Seq.newBuilder[Long])
    keys.foreach(k => parts(rnd.nextInt(nParts)) += k)
    var summaries = parts.toSeq.map(_.result())
      .map(p => p.foldLeft(agg.zero)(agg.reduce))
    // merge in random pair order (arbitrary merge tree)
    while (summaries.length > 1) {
      val i = rnd.nextInt(summaries.length)
      val a = summaries(i)
      val rest = summaries.patch(i, Nil, 1)
      val j = rnd.nextInt(rest.length)
      val merged = agg.merge(rest(j), a)
      summaries = rest.patch(j, Seq(merged), 1)
    }
    agg.finish(summaries.head)
  }

  test("every key above n/(capacity+1) survives any partitioning") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 50).foreach { trial =>
      val capacity = 4 + rnd.nextInt(60)
      val n = 500 + rnd.nextInt(3000)
      // skewed stream: geometric key frequencies + uniform noise tail
      val keys: Seq[Long] = Seq.fill(n) {
        if (rnd.nextBoolean()) (1L << rnd.nextInt(6)) // heavy candidates
        else 1000L + rnd.nextInt(500)                 // long noise tail
      }
      val shuffled = rnd.shuffle(keys)
      val trueCounts = shuffled.groupBy(identity).view.mapValues(_.size).toMap
      val threshold = n.toDouble / (capacity + 1)
      val mustSurvive = trueCounts.filter(_._2 > threshold).keySet
      val survivors = runPartitioned(new MisraGriesAgg(capacity),
        shuffled, rnd).toSet
      assert(survivors.size <= capacity,
        s"trial $trial: summary exceeded capacity")
      val dropped = mustSurvive -- survivors
      assert(dropped.isEmpty,
        s"trial $trial (cap=$capacity, n=$n): dropped heavy keys $dropped")
    }
  }

  test("a uniform stream below threshold yields no false guarantees") {
    // sanity: the summary never *grows* keys — counts are undercounts
    val agg = new MisraGriesAgg(8)
    val keys = (1L to 1000L).map(_ % 100)
    val sketch = keys.foldLeft(agg.zero)(agg.reduce)
    sketch.foreach { case (k, c) =>
      assert(c <= keys.count(_ == k), "sketch counts must never exceed truth")
    }
  }
}
