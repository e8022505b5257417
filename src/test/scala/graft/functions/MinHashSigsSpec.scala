package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native one-pass MinHash signature expression must agree with the
  * interpreted column formulation it replaced (md5-derived base hash +
  * affine permutations), which the DuckDB oracle also reproduces.
  */
class MinHashSigsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private val n = 16

  test("native signatures equal the interpreted transform+array_min formulation") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("x y z")),
      (3L, Seq("the quick fox", "quick fox jumps", "über ünïcode €")),
      (4L, (1 to 200).map(i => s"tok$i tok${i + 1} tok${i + 2}"))
    ).toDF("doc_id", "shd")
    val both = docs
      .withColumn("native", MinHashSigs.minhash_sigs(col("shd"), n))
      .withColumn("hx", shingleHashes(col("shd")))
      .withColumn("interp", array((0 until n).map(i => minhash(col("hx"), i)): _*))
      .select("doc_id", "native", "interp")
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("signature agreement estimates Jaccard for overlapping sets") {
    val a = (1 to 40).map(i => s"s$i")
    val b = (21 to 60).map(i => s"s$i") // true J = 20/60 ≈ 0.33
    val sigs = Seq((1L, a), (2L, b)).toDF("doc_id", "shd")
      .select(MinHashSigs.minhash_sigs(col("shd"), 64).as("m"))
      .collect().map(_.getSeq[Long](0))
    val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 64.0
    assert(agree > 0.1 && agree < 0.6, s"agreement $agree")
  }
}
