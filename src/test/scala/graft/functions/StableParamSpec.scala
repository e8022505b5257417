package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext

import graft.SparkSpec

/** [[StableLong]] exists for exactly one property: two plans differing
  * ONLY in the carried value must generate byte-identical code (the
  * codegen cache keys on source text; an inlined literal forced a Janino
  * compile per micro-batch — 65/trigger measured in round 12). Pin the
  * property itself, not just the value semantics.
  */
class StableParamSpec extends SparkSpec {
  import StableLong.{intDiv, stableLit}
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("generated source is identical across values") {
    def src(v: Long): String = {
      val ctx = new CodegenContext
      StableLong(v).genCode(ctx).code.toString
    }
    assert(src(1L) == src(987654321L))
  }

  test("evaluates to its value in both codegen and interpreted paths") {
    val df = Seq(10L, 20L).toDF("x")
    assert(df.select((col("x") + stableLit(5L)).as("y")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(15L, 25L))
    assert(StableLong(7L).eval(null) == 7L)
    assert(!StableLong(7L).foldable)
  }

  test("intDiv matches SQL div semantics (truncation toward zero)") {
    val df = Seq(7L, -7L, 0L).toDF("x")
    val got = df.select(intDiv(col("x"), stableLit(3L)).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = df.selectExpr("x div 3").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }
}
