package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Decode, FbEncoders}
import graft.plans.NexusPlan

/** The full Kafka-deployment data path minus the broker: raw FlatBuffers
  * WIRE BYTES → envelope dispatch + native payload decode → per-schema
  * frame → StreamingJob micro-batch → parquet tables. Proves the decode
  * expressions feed the writer modules directly (round 1 could only route
  * JSON fixtures through the sink).
  */
class WireToSinkSpec extends SparkSpec {
  import spark.implicits._

  private val template =
    """{ "children": [
      |  { "name": "speed", "type": "group", "children": [
      |    { "module": "f144",
      |      "config": { "source": "speed", "topic": "tp",
      |                  "enable_epics_con_info": false,
      |                  "enable_alarm_info": false } } ] },
      |  { "name": "env", "type": "group", "children": [
      |    { "module": "se00", "config": { "source": "sensor", "topic": "tp",
      |                                    "type": "double" } } ] }
      |] }""".stripMargin

  test("wire bytes flow through decode expressions into the sink") {
    // a mixed "topic" of raw messages, as a Kafka batch would deliver them
    val wire = Seq(
      (0L, FbEncoders.f144("speed", 10100L * 1000000L, 10.0)),
      (1L, FbEncoders.se00("sensor", 1, 1000000.0, None, 1L,
        10150L * 1000000L, Seq(5.0, 6.0), "float64")),
      (2L, FbEncoders.f144("speed", 10200L * 1000000L, 15.0)),
      (3L, FbEncoders.se00("sensor", 1, 1000000.0, Some(Seq(77L, 88L)), 2L,
        10250L * 1000000L, Seq(7.0, 8.0), "float64"))
    ).toDF("offset", "value")

    // decode once: envelope for routing, payload per schema id
    val decoded = wire
      .withColumn("env", Decode.decode_envelope(col("value")))
      .withColumn("topic", lit("tp"))
    val f144 = decoded.filter(col("env.schema_id") === "f144")
      .withColumn("d", Decode.decode_f144(col("value")))
      .select(col("topic"), col("env.source_name").as("source_name"),
        col("offset"), col("env.timestamp").as("ts"), col("d.value").as("value"))
    val se00 = decoded.filter(col("env.schema_id") === "se00")
      .withColumn("d", Decode.decode_se00(col("value")))
      .select(col("topic"), col("env.source_name").as("source_name"),
        col("offset"), col("env.timestamp").as("ts"),
        col("d.time_delta").as("time_delta"), col("d.timestamps").as("timestamps"),
        col("d.values").as("values"))

    val out = Files.createTempDirectory("graft-wire").toString
    val job = new StreamingJob(spark, NexusPlan.parse(template), out, 10000, 15000)
    job.processBatch("f144", f144)
    job.processBatch("se00", se00)
    job.finish()

    val speed = spark.read.parquet(s"$out/data/speed/data").orderBy("row").collect()
    assert(speed.map(_.getAs[Double]("value")).toSeq == Seq(10.0, 15.0))
    assert(speed.map(_.getAs[Long]("time")).toSeq ==
      Seq(10100000000L, 10200000000L))

    val env = spark.read.parquet(s"$out/data/env/data").orderBy("row").collect()
    assert(env.map(_.getAs[Double]("value")).toSeq == Seq(5.0, 6.0, 7.0, 8.0))
    // msg 1: generated t0 + i·Δ; msg 3: provided timestamps win
    assert(env.map(_.getAs[Long]("time")).toSeq ==
      Seq(10150000000L, 10151000000L, 77L, 88L))
  }

  test("rejected wire messages count per error type (F8 counters)") {
    import graft.operators.StreamKernel
    val mixed = Seq(
      (0L, FbEncoders.f144("s", 123L, 1.0)),                  // valid
      (1L, Array[Byte](1, 2, 3)),                             // too small
      (2L, "xxxxzzzz-not-a-flatbuffer-at-all".getBytes),      // unknown id
      (3L, FbEncoders.f144("s", 0L, 1.0)),                    // zero timestamp
      (4L, "xxxxzzzz-also-not-valid-content".getBytes)        // unknown id
    ).toDF("offset", "value")
      .withColumn("env", Decode.decode_envelope(col("value")))
    val counts = StreamKernel.errorCounters(mixed).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "BufferTooSmall" -> 1L, "UnknownFlatbufferID" -> 2L, "ZeroTimestamp" -> 1L))
  }
}
