package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.plans.NexusPlan
import graft.sources.Fixtures.Ev44Msg
import graft.streaming.StreamingJob

/** The driver-side parquet writer must be indistinguishable from the Spark
  * write path to every reader: same directory, same values, same merged
  * schema — files from both paths coexist in one table. And the streaming
  * job must actually take it for driver-materialized tables (ev44 cue).
  */
class LocalParquetSpec extends SparkSpec {
  import spark.implicits._

  test("local file and Spark file coexist in one dir with identical read-back") {
    val dir = Files.createTempDirectory("graft-localpq").toString + "/t"
    // Spark writes the first file
    val df = Seq((0L, 10L, 1000L), (1L, 20L, 2000L))
      .toDF("row", "cue_index", "cue_timestamp_zero")
    df.coalesce(1).write.mode("append").parquet(dir)
    // driver path appends the second — rows arrive as catalyst InternalRows
    val schema = StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("cue_index", LongType, nullable = false),
      StructField("cue_timestamp_zero", LongType, nullable = false)))
    val rows = Seq(
      org.apache.spark.sql.catalyst.InternalRow(2L, 30L, 3000L),
      org.apache.spark.sql.catalyst.InternalRow(3L, 40L, 4000L))
    assert(LocalParquet.supports(schema))
    assert(LocalParquet.write(dir, schema, rows) == 2L)
    val back = spark.read.parquet(dir).orderBy("row").collect()
    assert(back.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 10L, 1000L), (1L, 20L, 2000L), (2L, 30L, 3000L), (3L, 40L, 4000L)))
    assert(spark.read.parquet(dir).schema.fieldNames.toSeq ==
      Seq("row", "cue_index", "cue_timestamp_zero"))
    // no temp/crc residue, exactly one part-local file
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
    assert(files.count(_.contains("part-local-")) == 1)
    assert(!files.exists(_.contains("inprogress")))
  }

  test("all supported primitive types round-trip, incl. nulls and strings") {
    val dir = Files.createTempDirectory("graft-localpq2").toString + "/t"
    val schema = StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.catalyst.InternalRow(
        0L, 7, 2.5, 1.5f, true,
        org.apache.spark.unsafe.types.UTF8String.fromString("héllo")),
      org.apache.spark.sql.catalyst.InternalRow(1L, null, null, null, null, null))
    LocalParquet.write(dir, schema, rows)
    val back = spark.read.parquet(dir).orderBy("row").collect()
    assert(back(0).getInt(1) == 7 && back(0).getDouble(2) == 2.5 &&
      back(0).getFloat(3) == 1.5f && back(0).getBoolean(4) &&
      back(0).getString(5) == "héllo")
    assert((1 to 5).forall(back(1).isNullAt))
    // arrays are out of scope — the caller must fall back to the Spark path
    assert(!LocalParquet.supports(StructType(Seq(
      StructField("a", ArrayType(LongType), nullable = true)))))
  }

  test("streaming ev44 cue rides the driver path: part-local file, exact chain") {
    val template =
      """{ "children": [
        |  { "name": "entry", "type": "group", "children": [
        |    { "name": "events", "type": "group", "children": [
        |      { "module": "ev44",
        |        "config": { "source": "det", "topic": "tp",
        |                    "cue_interval": 25 } } ] } ] } ] }""".stripMargin
    val out = Files.createTempDirectory("graft-cuelocal").toString
    val job = new StreamingJob(spark, NexusPlan.parse(template), out, 0, 1L << 40)
    // 3 batches x 4 msgs x 10 events = 120 events; greedy 25-chain fires
    // at the first message CROSSING lastCue+25 (cumulative events 30, 60,
    // 90, 120 → cue event indexes 29, 59, 89, 119), with the anchor
    // carried across batch boundaries
    (0 until 3).foreach { b =>
      job.processBatch("ev44", (0 until 4).map { i =>
        val o = b * 4L + i
        Ev44Msg("tp", "det", o, 1000 + o, (1000 + o) * 1000000L,
          Seq((1000 + o) * 1000000L), Seq(0),
          Seq.tabulate(10)(j => j), Seq.tabulate(10)(j => j + 1))
      }.toDF())
    }
    job.finish()
    val cues = spark.read.parquet(s"$out/data/entry/events/cue")
      .orderBy("cue_index").collect()
    assert(cues.map(_.getAs[Long]("cue_index")).toSeq == Seq(29L, 59L, 89L, 119L))
    assert(job.counter("entry/events", "cue") == 4L)
    // the per-batch cue files came from the driver path, not a write job
    val cueFiles = Files.list(Paths.get(s"$out/data/entry/events/cue"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(cueFiles.exists(_.contains("part-local-")),
      s"expected a part-local file among ${cueFiles.mkString(", ")}")
  }

  test("small triggers ride the bounded-collect driver path; big ones fall back") {
    // production f144 shape: a slow EPICS source lands 1-3 messages per
    // 10 s trigger — the data append must not pay a write job for them.
    // A large trigger (> maxRows hint) must keep the Spark path so file
    // shaping stays distributed. Both file kinds coexist in one table.
    val template =
      """{ "children": [
        |  { "name": "entry", "type": "group", "children": [
        |    { "name": "speed", "type": "group", "children": [
        |      { "module": "f144",
        |        "config": { "source": "speed", "topic": "tp",
        |                    "enable_epics_con_info": false,
        |                    "enable_alarm_info": false } } ] } ] } ] }""".stripMargin
    val out = Files.createTempDirectory("graft-smalltrig").toString
    val job = new StreamingJob(spark, NexusPlan.parse(template), out, 0, 1L << 40)
    def msgs(from: Long, n: Int) = (0 until n).map { i =>
      val o = from + i
      graft.sources.Fixtures.F144Msg("tp", "speed", o, 1000 + o,
        (1000 + o) * 1000000L, o.toDouble)
    }
    job.processBatch("f144", msgs(0, 3).toDF())    // tiny → driver path
    // past BOTH the collect bound and the fused-payload overflow bound
    // (4×maxRows): must stay on the distributed Spark write path
    job.processBatch("f144", msgs(3, 600).toDF())
    // opting out forces the Spark path even for a tiny trigger
    spark.conf.set("spark.graft.stream.localAppend.maxRows", "-1")
    try job.processBatch("f144", msgs(603, 2).toDF())
    finally spark.conf.unset("spark.graft.stream.localAppend.maxRows")
    job.finish()
    val dir = s"$out/data/entry/speed/data"
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(files.count(_.contains("part-local-")) == 1,
      s"exactly the tiny trigger should be a local file: ${files.mkString(", ")}")
    assert(files.count(!_.contains("part-local-")) >= 2,
      "the big and opted-out triggers stay on the Spark path")
    val back = spark.read.parquet(dir).orderBy("row").collect()
    assert(back.length == 605)
    assert(back.map(_.getAs[Long]("row")).toSeq == (0L until 605L))
    assert(back.map(_.getAs[Double]("value")).toSeq == (0 until 605).map(_.toDouble))
    assert(job.counter("entry/speed", "data") == 605L)
  }
}
