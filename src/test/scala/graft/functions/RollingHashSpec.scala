package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.RollingHash.rolling_hash
import graft.operators.MultimodalOps

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  /** straightforward BigInt reference implementation */
  private def ref(s: String): Long = {
    val mod = BigInt((1L << 61) - 1)
    s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) =>
      (h * 257 + (b & 0xff)) % mod).toLong
  }

  test("matches a BigInt reference; order-sensitive; deterministic") {
    val texts = Seq("", "a", "ab", "ba", "the quick brown fox", "ü¶ñ",
      "a" * 1000)
    val out = texts.toDF("t").select(rolling_hash($"t")).collect().map(_.getLong(0))
    texts.zip(out).foreach { case (t, h) => assert(h == ref(t), s"for '$t'") }
    assert(out(2) != out(3)) // "ab" vs "ba"
  }

  test("multimodal resize yields fixed-size payloads with cyclic padding") {
    val assets = MultimodalOps.documentAssets(spark,
      Seq((1L, "abc"), (2L, "0123456789")).toDF("doc_id", "text"))
    val resized = MultimodalOps.resize(assets, 6).collect().sortBy(_.id)
    assert(resized.forall(_.content.length == 6))
    assert(new String(resized(0).content) == "abcabc")  // padded
    assert(new String(resized(1).content) == "012345")  // truncated
  }
}
