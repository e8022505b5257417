package graft.queries

import java.lang.Double.doubleToRawLongBits

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IEEE signed-zero normalization between the engine and the DuckDB
  * oracle (the r7 `embed_covariance` red row).
  *
  * The asymmetry: DuckDB's `round()` preserves the sign of zero
  * (`round(-1e-9, 6) → -0.0`), while every engine-side rounding path —
  * Spark's `functions.round` and the driver-side
  * `BigDecimal.setScale(6, HALF_UP)` used by `embed_covariance` — goes
  * through `BigDecimal`, which cannot represent `-0.0` and emits `+0.0`.
  * A true value of ≈ -1e-9 therefore hash-mismatches on the zero's sign
  * alone, with both engines numerically correct.
  *
  * The fix is on the oracle side: `round(x, 6) + 0.0`, because IEEE 754
  * round-to-nearest defines `(-0.0) + (+0.0) = +0.0`. These tests pin
  * the three facts the fix relies on, bit-for-bit.
  */
class SignedZeroSpec extends SparkSpec {

  private val PosZeroBits = doubleToRawLongBits(0.0)

  test("IEEE: -0.0 + 0.0 is +0.0 (the oracle-side normalizer)") {
    assert(doubleToRawLongBits(-0.0 + 0.0) === PosZeroBits)
    // and it is the identity everywhere else, including +0.0 and negatives
    assert(doubleToRawLongBits(0.0 + 0.0) === PosZeroBits)
    assert(-1.5e-6 + 0.0 === -1.5e-6)
  }

  test("Spark round() emits +0.0 for tiny-negative and -0.0 inputs") {
    val row = spark
      .range(1)
      .select(
        round(lit(-1e-9), 6).as("tiny"),
        round(lit(-0.0), 6).as("negzero"),
        round(lit(-1.5e-6), 6).as("nonzero"))
      .head()
    assert(doubleToRawLongBits(row.getDouble(0)) === PosZeroBits)
    assert(doubleToRawLongBits(row.getDouble(1)) === PosZeroBits)
    assert(row.getDouble(2) === -2e-6) // HALF_UP away from zero, sign kept
  }

  test("the embed_covariance emit path maps a planted -1e-9 entry to +0.0") {
    // exactly the expression at the covariance emit: BigDecimal HALF_UP
    def emit(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(doubleToRawLongBits(emit(-1e-9)) === PosZeroBits)
    assert(doubleToRawLongBits(emit(0.0)) === PosZeroBits)
    assert(emit(-0.0000015) === -0.000002)
  }

  test("oracle SQL for signed rounded columns carries the + 0.0 normalizer") {
    // every oracle round() whose domain straddles zero must normalize;
    // this greps the shipped SQL so a future signed round can't regress
    val sql = graft.SparkEntry.oracleSql("embed_covariance")
    assert(sql.contains("round(covar_pop(a.v, b.v), 6) + 0.0"))
    val signedCols =
      Seq("cosine", "mcos", "qcos", "fcos", "pmi", "nll", "zipf_slope",
        "quality_nll_corr", "kl_unigram", "avg_logscore", "mean_cos")
    val bare = for {
      (k, s) <- graft.SparkEntry.oracleSql.toSeq
      line <- s.linesIterator
      col <- signedCols
      if line.contains(s"6) AS $col") && line.contains("round(")
    } yield s"$k: $line"
    assert(bare.isEmpty, s"bare signed round in oracle SQL:\n${bare.mkString("\n")}")
  }
}
