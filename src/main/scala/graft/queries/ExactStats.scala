package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent 6-dp mean, identical bit-for-bit in Spark and the
  * DuckDB oracle.
  *
  * A plain `round(avg(x), 6)` is NOT cross-engine stable: both engines
  * sum doubles in their own order, the two sums can differ by an ulp,
  * and on a knife-edge group the ulp flips the 6th decimal (found by
  * the round-9 sf1 gate run: `w1_f144_stats` group of 64 values whose
  * exact mean is `…0625`). The stable construction:
  *
  *   1. per-value `double → DECIMAL(38,18)` is EXACT for every double's
  *      shortest decimal representation (≤ 17 significant digits), and
  *      both engines take exactly that path — Spark's cast goes through
  *      `BigDecimal.valueOf` (shortest repr), DuckDB through an explicit
  *      `CAST(x AS VARCHAR)` (shortest repr) because its direct
  *      double→decimal cast is NOT repr-based;
  *   2. the DECIMAL sum is exact, hence order-independent;
  *   3. decimal → double must go through VARCHAR on the DuckDB side:
  *      DuckDB's native `CAST(DECIMAL AS DOUBLE)` divides the int128
  *      payload by 10^scale in double arithmetic and lands 1 ulp off
  *      the nearest double (measured: 3307.78 → 3307.7799999999997),
  *      while Spark's decimal→double is correctly rounded;
  *   4. the quotient `sumDouble / n` is IEEE-deterministic, and the
  *      final 6-dp round of that SAME double agrees because both sides
  *      round the shortest decimal repr HALF_UP (Spark natively; DuckDB
  *      via the VARCHAR → DECIMAL(38,18) → round path, the same trick
  *      as `DocQueries.sqlRx`).
  *
  * Call sites must hand BOTH helpers an expression that is already a
  * DOUBLE (cast floats first): Spark widens a float to its exact binary
  * double, and only the double's shortest repr matches what the oracle
  * stringifies after its own `CAST(… AS DOUBLE)`.
  */
object ExactStats {

  /** `round(Σx / n, 6)` with an exact decimal sum; `x` must be a DOUBLE
    * expression, `n` the matching non-null count.
    */
  def meanExact6(x: Column, n: Column): Column =
    round(sum(x.cast(DecimalType(38, 18))).cast("double") / n, 6)

  /** DuckDB mirror of [[meanExact6]]; `x` must already be DOUBLE-typed
    * SQL, `n` the matching count expression.
    */
  def sqlMeanExact6(x: String, n: String = "count(*)"): String =
    s"CAST(round(CAST(CAST(CAST(CAST(sum(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / $n AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)"

  /** `round(Σx, 6)` with the round applied directly to the exact
    * decimal sum (no double hop at all — a weighted sum needs no
    * division, so the entire fold stays exact and the single rounding
    * is HALF_UP on both engines). For sums of genuine doubles whose
    * term count makes summation-order ulps likely (e.g. a
    * vocabulary-sized KL fold).
    */
  def sumExact6(x: Column): Column =
    round(sum(x.cast(DecimalType(38, 18))), 6).cast("double")

  /** DuckDB mirror of [[sumExact6]]; the decimal→double hop goes
    * through VARCHAR (exact digits → nearest double) because DuckDB's
    * native decimal→double cast is 1 ulp off.
    */
  def sqlSumExact6(x: String): String =
    s"CAST(CAST(round(sum(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(38,18))), 6) AS VARCHAR) AS DOUBLE)"
}
