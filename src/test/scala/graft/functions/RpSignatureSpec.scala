package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Random-hyperplane signature: the native one-pass expression must match
  * a naive per-plane computation, and the dyadic plane matrix must be
  * exactly reproducible from integer arithmetic.
  */
class RpSignatureSpec extends SparkSpec {
  import spark.implicits._
  import VectorExpressions.{dyadicPlanes, rp_signature}

  test("signature bits equal naive sign-of-projection per plane") {
    val planes = dyadicPlanes(16, 8)
    val vecs = Seq(
      Seq(1.0, 0.0, -2.0, 3.0, 0.5, -0.5, 2.0, -1.0),
      Seq.fill(8)(0.0),
      Seq(-1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 1.0))
    val got = vecs.map(Tuple1(_)).toDF("v")
      .select(rp_signature(col("v"), planes)).collect().map(_.getLong(0))
    val want = vecs.map { v =>
      planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
        val dot = v.zip(p).foldLeft(0.0)((s, ab) => s + ab._1 * ab._2)
        if (dot >= 0) acc | (1L << i) else acc
      }
    }
    assert(got.toSeq == want)
  }

  test("dyadic planes are exact and bounded in [-1, 1)") {
    val planes = dyadicPlanes(16, 64)
    assert(planes.length == 16 && planes.forall(_.length == 64))
    assert(planes.flatten.forall(x => x >= -1.0 && x < 1.0))
    // spot-check the closed form: component (i=2, j=5)
    val k = (2L * 64 + 5) * 2654435761L + 12345L
    assert(planes(2)(5) == ((k % 1024L) - 512L).toDouble / 512.0)
    // every double is a multiple of 1/512 — exactly representable
    assert(planes.flatten.forall(x => (x * 512.0) == math.rint(x * 512.0)))
  }
}
