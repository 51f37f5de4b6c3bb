package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure kernels (SURVEY.md §5 plan: ScalaCheck for
  * invariants). No SparkSession needed — these run per generated case. */
object KernelProperties extends Properties("kernels") {

  // ── strptime translation: format→parse round-trips for real dates ──────
  // years within the 'yy' pivot window (2000-2099) so %d.%m.%y can
  // round-trip — two-digit years outside it can't, by definition
  private val dateGen = for {
    y <- Gen.choose(2001, 2068)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield java.time.LocalDate.of(y, m, d)

  private val fmtGen = Gen.oneOf("%Y-%m-%d", "%m/%d/%Y", "%d.%m.%y", "%Y%m%d")

  property("strptime round-trip") = forAll(dateGen, fmtGen) { (d, fmt) =>
    val javaPattern = Dialect.strptimeToJava(fmt)
    val dtf = java.time.format.DateTimeFormatter.ofPattern(javaPattern)
    val formatted = d.format(dtf)
    java.time.LocalDate.parse(formatted, dtf) == d
  }

  property("strptime translation is idempotent in length bounds") =
    forAll(fmtGen) { fmt =>
      val p = Dialect.strptimeToJava(fmt)
      p.nonEmpty && !p.contains('%')
    }

  // ── LSH plane coefficients (Dedup.lshPlaneCoef) ─────────────────────────
  property("lsh plane coefficients are bounded and plane-distinct") =
    forAll(Gen.choose(0, 63), Gen.choose(2, 512)) { (j, dim) =>
      val coefs = (0 until dim).map(i => graft.operators.Dedup.lshPlaneCoef(j, i))
      val next = (0 until dim).map(i => graft.operators.Dedup.lshPlaneCoef(j + 1, i))
      coefs.forall(c => c >= -1000 && c <= 1000) &&
        coefs != next // consecutive planes never coincide element-wise
    }

  property("lsh plane deltas are not constant (no affine shift structure)") =
    forAll(Gen.choose(0, 30)) { j =>
      // the old affine LCG made plane j+1 an element-wise shift of plane
      // j (constant delta mod 2001); the multiplicative family must not
      val deltas = (0 until 64).map(i =>
        ((graft.operators.Dedup.lshPlaneCoef(j + 1, i) -
          graft.operators.Dedup.lshPlaneCoef(j, i)) % 2001 + 2001) % 2001)
      deltas.distinct.length > 8
    }

  // ── env expansion ───────────────────────────────────────────────────────
  private val nameGen = Gen.identifier.suchThat(_.nonEmpty).map(_.take(10))

  property("expandEnv substitutes known, preserves unknown") =
    forAll(nameGen, Gen.alphaNumStr) { (name, value) =>
      val env = Map(name -> value)
      graft.plan.PlanParser.expandEnv(s"x=$${$name} y=$$UNKNOWN_VAR_Q", env) ==
        s"x=$value y=$$UNKNOWN_VAR_Q"
    }

  // ── identifier quoting: output always safely delimited ──────────────────
  property("quoteIdent wraps every part in balanced quotes") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val q = graft.sources.Jdbc.quoteIdent(s)
      q.startsWith("\"") && q.endsWith("\"")
    }

  property("quoteIdent escapes embedded quotes") =
    forAll(Gen.alphaNumStr) { s =>
      val evil = s + "\"; DROP TABLE x --"
      val q = graft.sources.Jdbc.quoteIdent(evil)
      // embedded quote doubled → quote count inside is even
      q.count(_ == '"') % 2 == 0
    }

  // ── rolling hash: modular arithmetic matches BigInt ─────────────────────
  private val M = (1L << 61) - 1
  property("mulmod matches BigInt") =
    forAll(Gen.choose(0L, M - 1), Gen.choose(0L, M - 1)) { (a, b) =>
      RollingMinHash.mulmod(a, b) ==
        (BigInt(a) * BigInt(b) % BigInt(M)).toLong
    }

  property("rolling min-hash: superstring min <= substring min") =
    forAll(Gen.alphaStr.suchThat(_.length >= 8), Gen.alphaStr, Gen.alphaStr) {
      (core, pre, post) =>
        val k = 8
        val sub = RollingMinHash.compute(core, k)
        val sup = RollingMinHash.compute(pre + core + post, k)
        sup <= sub // superstring's windows are a superset
    }

  // ── winnowing: deque kernel equals the brute-force window-min set ──────
  property("winnow fingerprints == brute-force window minima") =
    forAll(Gen.alphaStr.suchThat(_.nonEmpty), Gen.choose(2, 10),
      Gen.choose(2, 8)) { (s, k, w) =>
      val got = WinnowFingerprints.compute(s, k, w).toLongArray().toSet
      // reference: hash every k-gram the same way RollingMinHash does
      // (kk = min(k, n)), then min per w-window of consecutive hashes
      val cps = s.codePoints().toArray
      val kk = math.min(k, cps.length)
      val hs = (0 to cps.length - kk).map { i =>
        cps.slice(i, i + kk).foldLeft(BigInt(0))((h, c) =>
          (h * 1000003 + c) % BigInt(M)).toLong
      }
      val want =
        if (hs.length <= w) Set(hs.min)
        else hs.sliding(w).map(_.min).toSet
      got == want
    }

  // ── native hash kernels: determinism + shingle structure ────────────────
  property("tokenShingles count = max(tokens-n+1, 0)") =
    forAll(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), Gen.choose(1, 5)) {
      (words, n) =>
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(words.mkString(" "))
        val got = NativeHash.tokenShingles(s, n).numElements()
        val expect = math.max(words.length - n + 1, 0)
        (words.isEmpty && got == 0) || got == expect
    }

  property("minhash signature is duplicate-insensitive") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { words =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      def arr(ws: Seq[String]) =
        new GenericArrayData(ws.map(w => UTF8String.fromString(w): Any).toArray)
      val once = NativeHash.minhashSig(arr(words), 16)
      val twice = NativeHash.minhashSig(arr(words ++ words), 16)
      (0 until 16).forall(i => once.getLong(i) == twice.getLong(i))
    }

  // ── DQ gate invariant mirrors ops.py:108 semantics (pure recompute) ────
  property("dq status == rows>=min ∧ nonnull ∧ fresh") =
    forAll(Gen.choose(0L, 100L), Gen.choose(0L, 100L),
      Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (rows, minRows, nonnull, fresh) =>
        val r = graft.operators.DqResult(rows, nonnull, fresh,
          status = rows >= minRows && nonnull && fresh)
        r.status == (r.rows >= minRows && r.nonnullOk && r.freshOk)
    }

  // ── TopKAgg: any reduce/merge split equals the global sort truth ───────
  private val rowGen = for {
    s <- Gen.choose(-1000, 1000).map(_ / 7.0)
    id <- Gen.choose(0L, 50L) // small id range forces score ties
  } yield (s, id)

  property("topk agg == sort-truth under any partitioning") =
    forAll(Gen.listOf(rowGen), Gen.choose(1, 6), Gen.choose(1, 5)) {
      (rows, k, nSplits) =>
        val agg = new TopKAgg(k)
        val expected = rows.sortBy { case (s, id) => (-s, id) }.take(k)
        // split into nSplits partitions, reduce each, then merge — the
        // result must not depend on how rows were partitioned
        val parts = rows.grouped(math.max(1, (rows.size + nSplits - 1)
          / nSplits)).toList
        val merged = parts
          .map(_.foldLeft(agg.zero)(agg.reduce))
          .foldLeft(agg.zero)(agg.merge)
        agg.finish(merged) == expected
    }
}
