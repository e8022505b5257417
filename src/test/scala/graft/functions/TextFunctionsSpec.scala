package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles produce word n-grams; short docs give empty array") {
    val df  = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TF.shingles(TF.tokens($"text"), 3).as("sh")).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0).isEmpty)
  }

  test("jaccard: identical sets 1.0, disjoint 0.0, half overlap") {
    val df = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("y")),
      (Seq("x", "y", "z"), Seq("x", "y", "w"))
    ).toDF("a", "b")
    val out = df.select(TF.jaccard($"a", $"b").as("j")).collect().map(_.getDouble(0))
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == 0.5)
  }

  test("minhash is identical for identical shingle sets, seed-dependent") {
    val df = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d"))).toDF("x", "y")
      .withColumn("hx", TF.shingleHashes($"x"))
      .withColumn("hy", TF.shingleHashes($"y"))
    val r = df
      .select(
        TF.minhash($"hx", 0).as("x0"), TF.minhash($"hy", 0).as("y0"),
        TF.minhash($"hx", 1).as("x1"))
      .collect()
      .head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("fingerprint normalizes case and whitespace") {
    val df = Seq(("Hello  World", "hello world")).toDF("a", "b")
    val r  = df.select(TF.fingerprint($"a").as("fa"), TF.fingerprint($"b").as("fb"))
      .collect().head
    assert(r.getString(0) == r.getString(1))
  }

  test("tokenHash32 matches the DuckDB hex-parse of md5 prefix") {
    // DuckDB: CAST(('0x' || substr(md5('tok'), 1, 8)) AS UBIGINT) = 1622020974
    val r = Seq("tok").toDF("t").select(TF.tokenHash32($"t")).collect().head.getLong(0)
    assert(r == 1622020974L)
  }

  test("minhash jaccard estimator: 1.0 on identical sets, tracks overlap") {
    val base = (1 to 40).map(i => s"sh$i")
    val half = base.take(20) ++ (1 to 20).map(i => s"other$i")
    val df = Seq((base, base), (base, half)).toDF("x", "y")
      .withColumn("hx", TF.shingleHashes($"x"))
      .withColumn("hy", TF.shingleHashes($"y"))
    val sigPairs = (0 until 32).map(i =>
      (TF.minhash($"hx", i), TF.minhash($"hy", i)))
    val est = df.select(TF.jaccardEstimate(sigPairs).as("e"))
      .collect().map(_.getDouble(0))
    assert(est(0) == 1.0)
    // true J = 20/60 ≈ 0.33; 32 hashes → estimator within ±0.25
    assert(est(1) > 0.08 && est(1) < 0.58, s"estimate was ${est(1)}")
  }

  test("native SimHash32 equals the explode-based builtin formulation") {
    import graft.functions.SimHash32.simhash32
    val df = Seq("the quick brown fox", "a b  c", "spark engine graft test")
      .toDF("text")
    val native = df.select(simhash32($"text")).collect().map(_.getLong(0))
    // reference formulation: explode tokens × 32 bits, majority vote
    val viaExplode = df
      .select($"text", explode(split($"text", " ")).as("tok"))
      .select($"text", TF.tokenHash32($"tok").as("num"))
      .select($"text", $"num", explode(sequence(lit(0), lit(31))).as("b"))
      .groupBy($"text", $"b")
      .agg(sum(expr("2 * ((num >> b) & 1) - 1")).as("sgn"))
      .groupBy($"text")
      .agg(sum(expr("CASE WHEN sgn > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END")).as("sh"))
    val byText = viaExplode.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val texts  = df.collect().map(_.getString(0))
    assert(texts.zip(native).forall { case (t, n) => byText(t) == n })
  }

  test("unsigned-64 compare and render treat the sign bit as the high bit") {
    val df = Seq((-1L, 0L)).toDF("a", "b") // -1 is u64 max
    val r = df.select(
      TF.unsignedLt($"a", $"b").as("lt"),
      TF.unsignedLt($"b", $"a").as("gt"),
      TF.unsignedString($"a").as("s")).collect().head
    assert(!r.getBoolean(0) && r.getBoolean(1))
    assert(r.getString(2) == "18446744073709551615")
  }

  test("stopword ratio") {
    val r = Seq("the cat in a hat").toDF("text")
      .select(TF.stopwordRatio(TF.tokens($"text"))).collect().head.getDouble(0)
    assert(r == 0.6) // the, in, a of 5
  }
}
