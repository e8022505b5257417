package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucket-size-targeted RP-LSH band geometry
  * ([[EmbedQueries.rpParams]]) and its oracle mirror.
  *
  * Why it exists: with FIXED band bits every LSH bucket grows linearly
  * with the corpus, so candidate pairs grow quadratically — measured in
  * round 9 as a 52× runtime blowup at 10× the bench corpus
  * (4-bit bands, 20k vectors → ~50M candidate pairs). Holding expected
  * bucket size constant (r ≈ log2(n / TargetBucket)) makes candidates
  * linear in n: ≈ bands · n · TargetBucket / 2.
  */
class RpAdaptiveSpec extends AnyFunSuite {

  test("rpParams: legacy 4x4 geometry below the first growth boundary") {
    // gate (sf0.01, n=500) and bench (sf0.1, n=2000) corpora both sit in
    // the legacy band — their oracle outputs and measured times are
    // unchanged by the adaptive scheme
    assert(EmbedQueries.rpParams(1L) === ((4, 4)))
    assert(EmbedQueries.rpParams(500L) === ((4, 4)))
    assert(EmbedQueries.rpParams(2000L) === ((4, 4)))
    assert(EmbedQueries.rpParams(2048L) === ((4, 4)))
  }

  test("rpParams: r grows one bit per corpus doubling, bands widen 4 -> 8") {
    assert(EmbedQueries.rpParams(2049L) === ((5, 8)))
    assert(EmbedQueries.rpParams(4096L) === ((5, 8)))
    assert(EmbedQueries.rpParams(16384L) === ((7, 8)))
    // the 10x scale-rehearsal corpus (20k vectors)
    assert(EmbedQueries.rpParams(20000L) === ((8, 8)))
  }

  test("rpParams: expected bucket size stays within TargetBucket at any n") {
    for (n <- Seq(1L, 100L, 2048L, 2049L, 1000000L, 1000000000L, 1L << 50)) {
      val (r, b) = EmbedQueries.rpParams(n)
      // n / 2^r <= TargetBucket — the invariant that keeps candidates linear
      assert(n <= (EmbedQueries.RpTargetBucket.toLong << r),
        s"n=$n r=$r violates the bucket-size target")
      // never narrower than the legacy geometry, and bands only widen
      assert(r >= 4 && (b == 4 || b == 8))
      if (r > 4) assert(b == 8)
    }
  }

  test("oracle SQL interpolates the real TargetBucket, not a pre-init 0") {
    // regression: RpTargetBucket as a plain (non-final) val initialized
    // AFTER the strict `sql` map during object init, interpolating 0 into
    // the oracle's prm subquery — every r was then min(empty) = NULL and
    // the oracle silently returned zero pairs
    val sql = EmbedQueries.sql("embed_rp_lsh_neardup")
    assert(sql.contains(s"<= ${EmbedQueries.RpTargetBucket} * (CAST(1 AS BIGINT) << r)"))
    assert(!sql.contains("<= 0 *"))
  }

  test("wide-band gate query forces the scaled geometry at gate scale") {
    // embed_rp_lsh_wide pins the (8, 8) engine path and its SQL mirror in
    // the driver gate even though the gate corpus itself picks (4, 4)
    val sql = EmbedQueries.sql("embed_rp_lsh_wide")
    assert(sql.contains("SELECT 8 AS r, 8 AS b"))
    assert(EmbedQueries.queries.contains("embed_rp_lsh_wide"))
  }
}
