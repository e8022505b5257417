package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-trip and validity tests for the FlatBuffers decode expressions
  * (D1/D2): encode with the flatbuffers-java builder, decode with our
  * wire-format reader expressions inside a Spark plan.
  */
class DecodeSpec extends SparkSpec {
  import spark.implicits._

  test("f144 round-trip: source, ns timestamp, double value") {
    val bytes = FbEncoders.f144("chopper:speed", 10100000000L, 12.5)
    val row = Seq(Tuple1(bytes)).toDF("value")
      .select(Decode.decode_f144($"value").as("d"))
      .select("d.source_name", "d.timestamp", "d.value")
      .collect().head
    assert(row.getString(0) == "chopper:speed")
    assert(row.getLong(1) == 10100000000L)
    assert(row.getDouble(2) == 12.5)
  }

  test("f144 default-elided scalar: value 0.0 decodes as 0.0, not a reject") {
    // conforming FlatBuffers builders OMIT a scalar equal to its schema
    // default, so a real producer's value=0.0 arrives with no value field
    // in the wrapper table; the accessor contract is "return the default".
    // Regression for the sf0.1 gate find: six value=0.0 events decoded to
    // null rows.
    val bytes = FbEncoders.f144("pv:zero", 10100000000L, 0.0)
    val row = Seq(Tuple1(bytes)).toDF("value")
      .select(Decode.decode_f144($"value").as("d"))
      .select("d.source_name", "d.timestamp", "d.value")
      .collect().head
    assert(row.getString(0) == "pv:zero")
    assert(row.getLong(1) == 10100000000L)
    assert(row.getDouble(2) == 0.0)
  }

  test("default-elided scalars across schemas: al00/ep01/tdct decode defaults") {
    // same elision contract as f144: severity/status/sequence_counter at
    // their schema default (0) are omitted from the wire; decoders must
    // yield the default, never reject
    val al = Seq(Tuple1(FbEncoders.al00("pv", 5L, 0.toShort, "ok"))).toDF("value")
      .select(Decode.decode_al00($"value").as("d"))
      .select("d.source_name", "d.severity").collect().head
    assert(al.getString(0) == "pv" && al.getShort(1) == 0)
    val ep = Seq(Tuple1(FbEncoders.ep01("pv", 5L, 0.toShort))).toDF("value")
      .select(Decode.decode_ep01($"value").as("d"))
      .select("d.source_name", "d.status").collect().head
    assert(ep.getString(0) == "pv" && ep.getShort(1) == 0)
    val td = Seq(Tuple1(FbEncoders.tdct("ch", Seq(1L, 2L), 0L))).toDF("value")
      .select(Decode.decode_tdct($"value").as("d"))
      .select("d.source_name", "d.sequence_counter").collect().head
    assert(td.getString(0) == "ch" && td.getLong(1) == 0L)
  }

  test("envelope: schema dispatch, source, extractor timestamp") {
    val f = FbEncoders.f144("src-a", 42L, 1.0)
    val e = FbEncoders.ev44("det", Seq(10200000000L), Seq(0), Seq(10, 20), Seq(1, 2))
    val rows = Seq(Tuple1(f), Tuple1(e)).toDF("value")
      .select(Decode.decode_envelope($"value").as("d"))
      .select("d.schema_id", "d.source_name", "d.timestamp", "d.valid", "d.error")
      .orderBy("d.schema_id")
      .collect()
    assert(rows(0).getString(0) == "ev44")
    assert(rows(0).getString(1) == "det")
    assert(rows(0).getLong(2) == 10200000000L) // reference_time[0] rule
    assert(rows(0).getBoolean(3))
    assert(rows(1).getString(0) == "f144")
    assert(rows(1).getLong(2) == 42L)
  }

  test("validity taxonomy: BufferTooSmall, UnknownFlatbufferID, ZeroTimestamp") {
    val tiny    = Array[Byte](1, 2, 3)
    val unknown = FbEncoders.f144("x", 1L, 0.0).clone()
    // overwrite the file identifier
    unknown(4) = 'z'; unknown(5) = 'z'; unknown(6) = 'z'; unknown(7) = 'z'
    val zero = FbEncoders.f144("x", 0L, 0.0)
    val rows = Seq(Tuple1(tiny), Tuple1(unknown), Tuple1(zero)).toDF("value")
      .select(Decode.decode_envelope($"value").as("d"))
      .select("d.valid", "d.error")
      .collect()
    assert(rows.forall(!_.getBoolean(0)))
    assert(rows.map(_.getString(1)).toSet ==
      Set("BufferTooSmall", "UnknownFlatbufferID", "ZeroTimestamp"))
  }

  test("ev44 round-trip: parallel arrays") {
    val bytes = FbEncoders.ev44("det", Seq(5L, 6L), Seq(0, 1), Seq(7, 8, 9), Seq(1, 2, 3))
    val row = Seq(Tuple1(bytes)).toDF("value")
      .select(Decode.decode_ev44($"value").as("d"))
      .select("d.source_name", "d.reference_time", "d.reference_time_index",
        "d.time_of_flight", "d.pixel_id")
      .collect().head
    assert(row.getString(0) == "det")
    assert(row.getSeq[Long](1) == Seq(5L, 6L))
    assert(row.getSeq[Int](2) == Seq(0, 1))
    assert(row.getSeq[Int](3) == Seq(7, 8, 9))
    assert(row.getSeq[Int](4) == Seq(1, 2, 3))
  }

  test("decoders GENERATE code (no silent interpreted fallback) and stay " +
    "inside one WholeStageCodegen span") {
    // fallback=false makes a codegen compile error fatal instead of
    // silently degrading to interpreted eval — this pins the doGenCode
    // static-call path for every decoder
    val msgs = Seq(
      FbEncoders.f144("s", 7L, 1.5),
      FbEncoders.ev44("det", Seq(5L), Seq(0), Seq(7), Seq(1)),
      FbEncoders.al00("s", 7L, 2, "alarm"),
      FbEncoders.ep01("s", 7L, 1),
      FbEncoders.tdct("s", Seq(9L)),
      FbEncoders.se00("s", 0, 1.0, None, 1L, 7L, Seq(1.0)),
      FbEncoders.ad00("s", 7L, Seq(1L), Seq(2.0)),
      FbEncoders.da00("s", 7L, Seq(FbEncoders.Da00Var(
        "v", "", "", Nil, Seq(1L), "float64", Seq(3.0))))
    )
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      // RDD-backed input: a local Seq would be constant-folded into a
      // LocalTableScan at optimization time (interpreted eval), leaving
      // nothing for codegen to prove
      val input = spark.createDataFrame(
        spark.sparkContext.parallelize(msgs.map(org.apache.spark.sql.Row(_)), 2),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "value", org.apache.spark.sql.types.BinaryType))))
      val df = input.select(
        Decode.decode_envelope($"value").as("env"),
        Decode.decode_f144($"value").as("f144"),
        Decode.decode_ev44($"value").as("ev44"),
        Decode.decode_al00($"value").as("al00"),
        Decode.decode_ep01($"value").as("ep01"),
        Decode.decode_tdct($"value").as("tdct"),
        Decode.decode_se00($"value").as("se00"),
        Decode.decode_ad00($"value").as("ad00"),
        Decode.decode_da00($"value").as("da00"))
      val rows = df.collect()
      assert(rows.length == msgs.length)
      // every payload decodes under its own schema, nulls elsewhere
      assert(rows.count(r => !r.isNullAt(r.fieldIndex("f144"))) == 1)
      assert(rows.count(r => !r.isNullAt(r.fieldIndex("da00"))) == 1)
      assert(rows.forall(r => !r.isNullAt(r.fieldIndex("env"))))
      // the decode projection participates in whole-stage codegen: the
      // `*(n)` marker on Project is the fused-span annotation
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
        s"decode Project not inside a WholeStageCodegen span:\n$plan")
    }
  }

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

  test("decode of a full pipeline slice: filter + project over decoded structs") {
    val msgs = (1 to 10).map(i =>
      Tuple1(FbEncoders.f144(if (i % 2 == 0) "even" else "odd", i * 1000L, i.toDouble)))
    val out = msgs.toDF("value")
      .select(Decode.decode_f144($"value").as("d"))
      .filter($"d.source_name" === "even")
      .agg(sum($"d.value")).collect().head.getDouble(0)
    assert(out == 2.0 + 4 + 6 + 8 + 10)
  }
}
