package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FbEncoders

/** The library's drop-in integration path: a vanilla session configured
  * with `spark.sql.extensions=graft.GraftExtensions` can call the custom
  * expressions straight from SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    // a shared session from other suites would be returned by getOrCreate
    // (ignoring the extensions conf) — detach it first, restore after build
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `.config("spark.sql.extensions", "graft.GraftExtensions")` works on a
    // fresh JVM; under a shared test SparkContext that conf isn't re-read,
    // so use the equivalent programmatic registration here
    // hygiene applied here too: if THIS suite runs first it creates the
    // JVM's one SparkContext, and the context-level defaults must hold
    // for ServiceHygieneSpec regardless of suite order
    val s = Service.withClusterHygiene(SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    s
  }

  test("simhash32 and decode_f144 are callable from SQL") {
    import spark.implicits._
    val sh = spark.sql("SELECT simhash32('the quick brown fox') AS s")
      .collect().head.getLong(0)
    assert(sh != 0L)

    val bytes = FbEncoders.f144("src-x", 123L, 7.5)
    Seq(Tuple1(bytes)).toDF("value").createOrReplaceTempView("raw")
    val row = spark.sql(
      "SELECT decode_f144(value).source_name AS s, decode_f144(value).value AS v FROM raw")
      .collect().head
    assert(row.getString(0) == "src-x")
    assert(row.getDouble(1) == 7.5)
  }

  test("decode_envelope classifies from SQL") {
    import spark.implicits._
    Seq(Tuple1(Array[Byte](1, 2))).toDF("value").createOrReplaceTempView("junk")
    val err = spark.sql("SELECT decode_envelope(value).error FROM junk")
      .collect().head.getString(0)
    assert(err == "BufferTooSmall")
  }

  test("all eight payload decoders and vector math are callable from SQL") {
    import spark.implicits._
    Seq(Tuple1(FbEncoders.al00("a", 5L, 2, "hot")))
      .toDF("value").createOrReplaceTempView("al")
    assert(spark.sql("SELECT decode_al00(value).message FROM al")
      .collect().head.getString(0) == "hot")
    Seq(Tuple1(FbEncoders.se00("s", 1, 2.0, None, 1L, 9L, Seq(3.0, 4.0))))
      .toDF("value").createOrReplaceTempView("se")
    assert(spark.sql("SELECT decode_se00(value).values FROM se")
      .collect().head.getSeq[Double](0) == Seq(3.0, 4.0))
    Seq(Tuple1(FbEncoders.da00("s", 7L,
      Seq(FbEncoders.Da00Var("v", "", "", Seq("x"), Seq(1L), "float64", Seq(8.5))))))
      .toDF("value").createOrReplaceTempView("da")
    assert(spark.sql("SELECT decode_da00(value).data[0].data[0] FROM da")
      .collect().head.getDouble(0) == 8.5)
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_norm(array(3.0d, 4.0d)) AS n")
      .collect().head
    assert(dot.getDouble(0) == 11.0)
    assert(dot.getDouble(1) == 5.0)
    // the remaining decoders resolve (analysis succeeds)
    Seq("decode_ep01", "decode_tdct", "decode_ad00").foreach { f =>
      assert(spark.sql(s"SELECT $f(value) FROM junk").collect().length == 1)
    }
  }

  test("text/hash expressions are callable from SQL") {
    // rolling_hash("ab") = (97·257 + 98) mod 2^61−1
    assert(spark.sql("SELECT rolling_hash('ab') AS h")
      .collect().head.getLong(0) == 97L * 257 + 98)
    // gram hashes of [1,2,3] at width 2: [1·B+2, 2·B+3]
    val wph = spark.sql(
      "SELECT window_poly_hash(array(1L, 2L, 3L), 2) AS g")
      .collect().head.getSeq[Long](0)
    assert(wph == Seq(1000003L + 2, 2 * 1000003L + 3))
    // char_gram_codes('abc', 3) = [97·65536 + 98·256 + 99]
    assert(spark.sql("SELECT char_gram_codes('abc', 3) AS c")
      .collect().head.getSeq[Long](0) == Seq(97L * 65536 + 98 * 256 + 99))
    // minhash_sigs matches the column formulation (spot value, k=2)
    assert(spark.sql("SELECT minhash_sigs(array('x'), 2) AS m")
      .collect().head.getSeq[Long](0).length == 2)
    // repetition_stats counts lines
    assert(spark.sql("SELECT repetition_stats('a\nb\na').n_lines AS n")
      .collect().head.getInt(0) == 3)
    // non-literal static arg is rejected with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT char_gram_codes('abc', length('xy')) FROM (SELECT 1)").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.contains("char_gram_codes"))
  }

  test("array_min_agg aggregates from SQL") {
    val rows = spark.sql(
      """SELECT g, array_min_agg(a) AS m FROM
        |  (SELECT 1 AS g, array(5L, 1L) AS a UNION ALL SELECT 1, array(2L, 9L))
        |GROUP BY g""".stripMargin)
      .collect()
    assert(rows.head.getSeq[Long](1) == Seq(2L, 1L))
  }

  test("top_k_structs aggregates from SQL") {
    val rows = spark.sql(
      """SELECT g, top_k_structs(v, 2) AS top FROM
        |  (SELECT 1 AS g, x AS v FROM (VALUES (5), (1), (9), (3)) t(x))
        |GROUP BY g""".stripMargin)
      .collect()
    assert(rows.head.getSeq[Int](1) == Seq(1, 3))
  }

  test("zorder_key interleaves from SQL") {
    // x=3 (bits 0,1), y=1 (bit 0), 2 bits: z = x0<<1 | y0<<0 | x1<<3 | y1<<2
    //   = 1<<1 + 1<<0 + 1<<3 + 0 = 11
    assert(spark.sql("SELECT zorder_key(2, 3L, 1L) AS z")
      .collect().head.getLong(0) == 11L)
    // dimension count over the 62-bit budget is rejected
    val err = intercept[Exception] {
      spark.sql("SELECT zorder_key(32, 1L, 2L, 3L)").collect()
    }
    assert(err.getMessage.contains("bits*dims"))
  }
}
