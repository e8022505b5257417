package graft.queries

import graft.SparkSpec

/** Recall of the multi-rotation SimHash blocking ([[DocQueries.simhashPairs]])
  * on planted bit-flip patterns: pairs whose differing bits sit in the HIGH
  * 16 bits — which a single high-16-prefix table provably cannot pair —
  * must surface through one of the rotated tables.
  */
class SimHashBlockingSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(hashes: (Long, Long)) = {
    val df = Seq((1L, hashes._1), (2L, hashes._2)).toDF("doc_id", "simhash")
    DocQueries.simhashPairs(df).collect()
  }

  test("prefix-bit flips are recalled (single-table blocking misses these)") {
    // 6 flips, all in bits 26..31: old high-16 blocking gives different
    // block keys (0x0000 vs 0xFC00) — no candidate. Rotation by 16 puts
    // the diff bits in the low half → shared block.
    val out = pairs((0x00000000L, 0xFC000000L))
    assert(out.length == 1)
    assert(out.head.getAs[Long]("hamming") == 6L)
  }

  test("flips across the prefix boundary are recalled") {
    // bits 14..19 straddle the 16-bit boundary: neither pure-prefix nor
    // pure-suffix; the rot=8 window [8,23]-as-suffix catches them
    val out = pairs((0x12345678L, 0x12345678L ^ 0x000FC000L))
    assert(out.length == 1)
  }

  test("suffix-only flips still pair (rot=0 table)") {
    val out = pairs((0x0F0F0F0FL, 0x0F0F0F0FL ^ 0x3FL)) // low 6 bits
    assert(out.length == 1)
    assert(out.head.getAs[Long]("hamming") == 6L)
  }

  test("pairs beyond the hamming budget are rejected even when blocked") {
    // same high-16 prefix, 8 differing low bits → candidates, then culled
    val out = pairs((0x12340000L, 0x123400FFL))
    assert(out.isEmpty)
  }

  test("documented residual gap: diffs spread across opposing windows") {
    // bits {0,8,16,24}: every cyclic 16-bit window contains ≥2 diff bits,
    // so all four tables miss — the known 4-table limitation (the full
    // guarantee needs all C(4,2) clean-block-pair tables)
    val out = pairs((0L, 0x01010101L))
    assert(out.isEmpty)
  }

  test("block width scales with corpus size, 16-bit up to 8.4M docs, capped at 26") {
    // legacy geometry preserved through every gate/bench/probe corpus
    assert(DocQueries.simhashBlockBits(0) == 16)
    assert(DocQueries.simhashBlockBits(500000) == 16)
    assert(DocQueries.simhashBlockBits(128L << 16) == 16)      // boundary in
    assert(DocQueries.simhashBlockBits((128L << 16) + 1) == 17) // boundary out
    // the random-collision floor (~n²/2^bb) stays linear: occupancy ≤ 128
    assert(DocQueries.simhashBlockBits(128L << 20) == 20)
    assert(DocQueries.simhashBlockBits(Long.MaxValue / 4) == 26) // cap
  }

  test("wider blocks are a strict candidate subset (sharper equality)") {
    // same corpus, forced 20-bit vs 16-bit blocks: every wide pair must
    // also be a legacy pair (widening only sharpens the block equality)
    val df = Seq.tabulate(64)(i =>
      (i.toLong, (i.toLong * 0x9E3779B9L) & 0xFFFFFFFFL)).toDF("doc_id", "simhash")
    def set(bb: Int) = DocQueries.simhashPairs(df, maxHamming = 32,
        blockBits = Some(bb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = set(20); val legacy = set(16)
    assert(wide.subsetOf(legacy), "wide blocks must not invent pairs")
  }
}
