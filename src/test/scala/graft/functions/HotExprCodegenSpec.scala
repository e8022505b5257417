package graft.functions

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the `doGenCode` static-call path for the hot non-decode
  * expression families (vector math, rolling hashes, MinHash/SimHash
  * signatures, repetition stats): with `spark.sql.codegen.fallback=false`
  * a codegen compile error is fatal instead of silently degrading to
  * interpreted eval, and the projection must land inside a
  * WholeStageCodegen span. Values are asserted against independently
  * computed expectations, so generated code = interpreted semantics.
  */
class HotExprCodegenSpec extends SparkSpec {
  import spark.implicits._

  private def withSQLConf(kv: (String, String))(f: => Unit): Unit = {
    val (k, v) = kv
    val prev   = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None    => spark.conf.unset(k)
    }
  }

  test("hot expression families GENERATE code (no interpreted fallback) " +
    "and stay inside one WholeStageCodegen span") {
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      // RDD-backed input so nothing constant-folds into a LocalTableScan
      val input = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("b a b a b", Array(1.0, 2.0, 3.0), Array(0.5, 0.5, 0.5)),
          Row("x\nx\ny z", Array(0.0, -1.0, 1.0), Array(1.0, 0.0, 0.0))), 2),
        StructType(Seq(
          StructField("text", StringType),
          StructField("v", ArrayType(DoubleType)),
          StructField("w", ArrayType(DoubleType)))))
      val cents  = Seq(Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0))
      val planes = VectorExpressions.dyadicPlanes(4, 3)
      val df = input.select(
        RollingHash.rolling_hash(F.col("text")).as("rh"),
        WindowPolyHash.window_poly_hash(
          TokenHashes.token_hashes(F.split(F.col("text"), " ")), 2).as("wph"),
        CharGramCodes.char_gram_codes(F.col("text"), 3).as("cgc"),
        MinHashSigs.minhash_sigs(F.split(F.col("text"), " "), 4).as("mhs"),
        SimHash32.simhash32(F.col("text")).as("sh"),
        RepetitionStats.repetition_stats(F.col("text")).as("rs"),
        VectorExpressions.dot_product(F.col("v"), F.col("w")).as("dp"),
        VectorExpressions.l2_norm(F.col("v")).as("l2"),
        VectorExpressions.centroid_dists(F.col("v"), cents).as("cd"),
        VectorExpressions.nearest_centroid(F.col("v"), cents).as("nc"),
        VectorExpressions.rp_signature(F.col("v"), planes).as("rp"),
        VectorExpressions.mat_vec(F.col("v"), cents).as("mv"),
        VectorExpressions.mat_vec_affine(F.col("v"), cents, Seq(1.0, 2.0)).as("mva"))
      val rows = df.collect()
      assert(rows.length == 2)

      val r0 = rows.find(_.getAs[Double]("dp") == 3.0).get // 1·.5+2·.5+3·.5
      assert(r0.getAs[Long]("rh") ==
        RollingMod.hashBytes("b a b a b".getBytes("UTF-8")))
      assert(r0.getAs[Double]("l2") == math.sqrt(1 + 4 + 9))
      assert(r0.getSeq[Double](r0.fieldIndex("cd")) == Seq(14.0, 0.0)) // d² per centroid
      assert(r0.getAs[Int]("nc") == 1)
      // window hash of ["b","a","b","a","b"] at w=2: 4 windows, (b,a)==(b,a)
      val wph = r0.getSeq[Long](r0.fieldIndex("wph"))
      assert(wph.length == 4 && wph(0) == wph(2) && wph(1) == wph(3))
      // 3-gram codes are big-endian byte packs, injective
      val cgc = r0.getSeq[Long](r0.fieldIndex("cgc"))
      assert(cgc.length == "b a b a b".length - 2)
      assert(cgc.head == (('b'.toLong << 16) | (' '.toLong << 8) | 'a'.toLong))
      // matrix kernels: rows of `cents` dotted with v = (1,2,3)
      assert(r0.getSeq[Double](r0.fieldIndex("mv")) == Seq(0.0, 14.0))
      assert(r0.getSeq[Double](r0.fieldIndex("mva")) == Seq(-1.0, 12.0))
      // "x\nx\ny z": 3 lines, 2 distinct, dup chars = 1
      val rs = rows.find(_.getAs[Double]("dp") == 0.0).get.getAs[Row]("rs")
      assert(rs.getAs[Int]("n_lines") == 3)
      assert(rs.getAs[Int]("n_dlines") == 2)
      assert(rs.getAs[Long]("dup_chars") == 1L)

      // the whole projection is one fused codegen span
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
        s"hot-expression Project not inside a WholeStageCodegen span:\n$plan")
    }
  }

  test("boundary_bucket GENERATES code (no fallback) and buckets correctly") {
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      // mixed-type range key (string, long) — the ChunkIds shape
      val input = spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(("a", 1L), ("a", 5L), ("b", 0L), ("b", 9L), ("c", 2L), ("a", 3L))
            .map { case (k, o) => Row(k, o) }, 2),
        StructType(Seq(StructField("k", StringType), StructField("o", LongType))))
      val schema = StructType(Seq(
        StructField("_c0", StringType), StructField("_c1", LongType)))
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(schema)
      val boundaries = Array(Row("a", 4L), Row("b", 5L)).map(r =>
        conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      val df = input.select(F.col("k"), F.col("o"),
        BoundaryBucket.boundary_bucket(
          F.struct(F.col("k").as("_c0"), F.col("o").as("_c1")), boundaries).as("pid"))
      val got = df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      // #{boundaries <= key} under (k, o) lexicographic order
      assert(got(("a", 1L)) == 0 && got(("a", 3L)) == 0)
      assert(got(("a", 5L)) == 1) // ("a",4) <= ("a",5) < ("b",5)
      assert(got(("b", 0L)) == 1)
      assert(got(("b", 9L)) == 2 && got(("c", 2L)) == 2)
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
        s"boundary_bucket Project not inside a WholeStageCodegen span:\n$plan")
    }
  }

  test("token_hashes passes null elements through as null hashes") {
    // the transform(tk, t => rolling_hash(t)) contract this expression
    // replaced: a null element yields a null hash, not an NPE'd task
    val out = spark.range(1)
      .select(TokenHashes.token_hashes(
        F.array(F.lit("a"), F.lit(null).cast("string"), F.lit("b"))).as("h"))
      .collect().head.getSeq[Any](0)
    assert(out.length == 3 && out(1) == null)
    assert(out(0) == RollingMod.hashBytes("a".getBytes("UTF-8")))
    assert(out(2) == RollingMod.hashBytes("b".getBytes("UTF-8")))
    // a provably null-free input (array of non-nullable literals) keeps
    // the tight containsNull=false schema; nullable inputs widen it
    val tight = spark.range(1)
      .select(TokenHashes.token_hashes(F.array(F.lit("a"), F.lit("b"))).as("h"))
    assert(!tight.schema("h").dataType.asInstanceOf[ArrayType].containsNull)
  }

  test("window_poly_hash mirrors the child's element nullability and " +
    "null-covering windows survive as nulls (never gram 0)") {
    // nullable-element input: schema must widen to containsNull=true so
    // downstream codegen (posexplode, groupBy) keeps the null checks —
    // a containsNull=false claim would read the null slot as gram 0 and
    // collide every null-covering window on one spurious gram
    val src = spark.range(1).select(
      F.array(F.lit(1L), F.lit(null).cast("long"), F.lit(2L), F.lit(3L)).as("xs"))
    val hashed = src.select(
      WindowPolyHash.window_poly_hash(F.col("xs"), 2).as("gh"))
    assert(hashed.schema("gh").dataType.asInstanceOf[ArrayType].containsNull)
    val gh = hashed.collect().head.getSeq[Any](0)
    // windows [1,null] and [null,2] cover the null → null grams;
    // window [2,3] is defined
    assert(gh.length == 3 && gh(0) == null && gh(1) == null)
    val b = graft.functions.WindowPolyHash.WindowBase
    assert(gh(2) == RollingMod.mulMod(2L, b) + 3L)
    // the null slot must survive a posexplode + groupBy round trip
    val grams = hashed
      .select(F.posexplode(F.col("gh")).as(Seq("p", "g")))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(grams.count(_._2 == null) == 2 && !grams.exists(_._2 == 0L))
    // a null-free child keeps the tight containsNull=false schema
    val tight = spark.range(1).select(
      WindowPolyHash.window_poly_hash(
        TokenHashes.token_hashes(F.split(F.lit("a b c"), " ")), 2).as("gh"))
    assert(!tight.schema("gh").dataType.asInstanceOf[ArrayType].containsNull)
  }

  test("minhash_sigs of an empty or all-null shingle set is null, " +
    "matching the transform+array_min column form") {
    // column form: array_min over zero hashed shingles yields null per
    // seed — two empty documents must NOT share a Long.MaxValue sentinel
    // signature. Both codegen and interpreted paths pin the null.
    def run(): Array[Row] = spark.range(1).select(
      MinHashSigs.minhash_sigs(
        F.array().cast("array<string>"), 4).as("empty"),
      MinHashSigs.minhash_sigs(
        F.array(F.lit(null).cast("string"), F.lit(null).cast("string")), 4)
        .as("allnull"),
      MinHashSigs.minhash_sigs(
        F.array(F.lit("x"), F.lit(null).cast("string")), 4).as("mixed"))
      .collect()
    def check(rows: Array[Row]): Unit = {
      val r = rows.head
      assert(r.isNullAt(0), "empty shingle set must have no signature")
      assert(r.isNullAt(1), "all-null shingle set must have no signature")
      val mixed = r.getSeq[Long](2)
      assert(mixed.length == 4 && !mixed.contains(Long.MaxValue))
    }
    check(run())
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check(run())
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("generated and interpreted paths agree on corpus data") {
    // same expressions evaluated with codegen ON vs factory forced OFF
    // (NO_CODEGEN) over real documents — value-identical results
    val docs = graft.core.Graft.documents(spark, "/root/testdata/sf0.001")
      .limit(200)
    def run(): Array[Row] = {
      val planes = VectorExpressions.dyadicPlanes(4, 3)
      docs.select(
        F.col("doc_id"),
        RollingHash.rolling_hash(F.col("text")).as("rh"),
        MinHashSigs.minhash_sigs(F.split(F.col("text"), " "), 4).as("mhs"),
        SimHash32.simhash32(F.col("text")).as("sh"),
        RepetitionStats.repetition_stats(F.col("text")).as("rs"))
        .orderBy("doc_id").collect()
    }
    val gen = run()
    val interp = {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(gen.sameElements(interp))
  }
}
