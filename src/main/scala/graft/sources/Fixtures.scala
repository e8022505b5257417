package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Batch source for the reference's JSON message fixtures — the Spark analog
  * of file-maker's StubConsumer path (`apps/file-maker.cpp:69-149`,
  * generators `src/FlatBufferGenerators.h:225-280`). One DataFrame per
  * schema id, each carrying the common envelope:
  *
  *   topic, source_name, offset (per-topic arrival order), kafka_ts_ms,
  *   ts (extractor timestamp, i64 ns)
  *
  * Fixture timestamps are milliseconds; ×10⁶ to ns at "encode" exactly like
  * the generators (`src/FlatBufferGenerators.h:35`). Extractor timestamps
  * follow `src/AccessMessageMetadata/...`: ev44 = reference_time[0], tdct =
  * timestamps[0], se00 = packet_timestamp, others = the timestamp field.
  */
object Fixtures {

  /** ep01 ConnectionInfo enum (streaming-data-types ep01 schema; golden
    * CONNECTED=2 per `domain-tests/test_writer_modules.py:67-77`).
    */
  val ConnectionInfo: Map[String, Short] = Map(
    "UNKNOWN" -> 0, "NEVER_CONNECTED" -> 1, "CONNECTED" -> 2,
    "DISCONNECTED" -> 3, "DESTROYED" -> 4, "CANCELLED" -> 5,
    "FINISHED" -> 6, "REMOTE_ERROR" -> 7
  )

  /** al00 Severity enum (golden OK=0 / MINOR=1,
    * `domain-tests/test_writer_modules.py:78-91`).
    */
  val Severity: Map[String, Short] =
    Map("OK" -> 0, "MINOR" -> 1, "MAJOR" -> 2, "INVALID" -> 3)

  final case class F144Msg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, value: Double)
  final case class Ep01Msg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, status: Short)
  final case class Al00Msg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, severity: Short, message: String)
  final case class Ev44Msg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, reference_time: Seq[Long],
      reference_time_index: Seq[Int], time_of_flight: Seq[Int], pixel_id: Seq[Int])
  final case class Ad00Msg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, dimensions: Seq[Long], data: Seq[Double])
  final case class Da00Msg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, name: String, axis_name: String, data: Seq[Double])
  final case class Se00Msg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, time_delta: Double,
      timestamps: Option[Seq[Long]], values: Seq[Double])
  final case class TdctMsg(topic: String, source_name: String, offset: Long,
      kafka_ts_ms: Long, ts: Long, timestamps: Seq[Long])

  /** Typed zero-row message frame per schema id — the create-phase seed:
    * the reference creates every stream's datasets (empty) at structure
    * creation (`HDFOperations`/module `init_hdf`), so a stream that never
    * receives a message still materializes its tables.
    */
  def emptyInput(spark: org.apache.spark.sql.SparkSession,
      moduleId: String): Option[org.apache.spark.sql.DataFrame] = {
    import spark.implicits._
    moduleId match {
      case "f144" => Some(spark.emptyDataset[F144Msg].toDF())
      case "ep01" => Some(spark.emptyDataset[Ep01Msg].toDF())
      case "al00" => Some(spark.emptyDataset[Al00Msg].toDF())
      case "ev44" => Some(spark.emptyDataset[Ev44Msg].toDF())
      case "ad00" => Some(spark.emptyDataset[Ad00Msg].toDF())
      case "da00" => Some(spark.emptyDataset[Da00Msg].toDF())
      case "se00" => Some(spark.emptyDataset[Se00Msg].toDF())
      case "tdct" => Some(spark.emptyDataset[TdctMsg].toDF())
      case _      => None
    }
  }

  private def num(jv: JValue): Double = jv match {
    case JInt(i)     => i.toDouble
    case JLong(l)    => l.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case other       => throw new IllegalArgumentException(s"not a number: $other")
  }
  private def lng(jv: JValue): Long = num(jv).toLong
  private def flatten(jv: JValue): Seq[Double] = jv match {
    case JArray(xs) => xs.flatMap(flatten)
    case v          => Seq(num(v))
  }
  private def dims(jv: JValue): Seq[Long] = jv match {
    case JArray(xs) =>
      xs.headOption match {
        case Some(inner @ JArray(_)) => xs.length.toLong +: dims(inner)
        case _                       => Seq(xs.length.toLong)
      }
    case _ => Nil
  }
  private def strField(m: JValue, k: String): String =
    (m \ k) match { case JString(s) => s; case v => v.toString }

  /** Parse the fixture JSON into per-schema DataFrames (driver-side parse —
    * this is the test seam, not the 100 TB data path).
    */
  def messageFrames(spark: SparkSession, messagesJson: String): Map[String, DataFrame] = {
    import spark.implicits._
    val msgs = JsonMethods.parse(messagesJson) match {
      case JArray(ms) => ms
      case _          => Nil
    }
    // stub-consumer offsets: sequential per topic in file order
    val counters = scala.collection.mutable.Map.empty[String, Long]
    val tagged = msgs.map { m =>
      val topic  = strField(m, "topic")
      val offset = counters.getOrElse(topic, 0L)
      counters(topic) = offset + 1
      (m, topic, offset)
    }
    def byId(id: String) = tagged.filter { case (m, _, _) => strField(m, "schema") == id }

    val f144 = byId("f144").map { case (m, t, o) =>
      F144Msg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        lng(m \ "timestamp") * 1000000L, num(m \ "value"))
    }
    val ep01 = byId("ep01").map { case (m, t, o) =>
      // the reference's file-maker converter maps anything that is not
      // CONNECTED to DISCONNECTED (`src/FlatBufferGenerators.h:233-239`);
      // this stub path mirrors the CONVERTER, not the full wire enum —
      // a NEVER_CONNECTED fixture must compare equal to the reference's
      // own file-maker output
      val status: Short =
        if (strField(m, "connection_status") == "ConnectionInfo::CONNECTED")
          ConnectionInfo("CONNECTED")
        else ConnectionInfo("DISCONNECTED")
      Ep01Msg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        lng(m \ "timestamp") * 1000000L, status)
    }
    val al00 = byId("al00").map { case (m, t, o) =>
      val name = strField(m, "severity").stripPrefix("Severity::")
      Al00Msg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        lng(m \ "timestamp") * 1000000L, Severity.getOrElse(name, 0),
        strField(m, "message"))
    }
    val ev44 = byId("ev44").map { case (m, t, o) =>
      val refNs = (m \ "reference_time") match {
        case JArray(xs)        => xs.map(x => lng(x) * 1000000L)
        case JNothing | JNull  => Nil // → ts 0: the ZeroTimestamp class
        case v                 => Seq(lng(v) * 1000000L)
      }
      val rti = (m \ "reference_time_index") match {
        case JArray(xs) => xs.map(x => lng(x).toInt)
        case _          => Seq(0)
      }
      val tof = flatten(m \ "time_of_flight").map(_.toInt)
      val pix = ((m \ "pixel_ids"), (m \ "pixel_id")) match {
        case (JArray(xs), _) => xs.map(x => lng(x).toInt)
        case (_, JArray(xs)) => xs.map(x => lng(x).toInt)
        case _               => Nil
      }
      // a fixture message with NO reference time is the decode path's
      // ZeroTimestamp rejection class — classify it (ts = 0, F8 drops
      // it), never abort the whole fixture file's parse
      Ev44Msg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        refNs.headOption.getOrElse(0L), refNs, rti, tof, pix)
    }
    val ad00 = byId("ad00").map { case (m, t, o) =>
      Ad00Msg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        lng(m \ "timestamp") * 1000000L, dims(m \ "data"), flatten(m \ "data"))
    }
    val da00 = byId("da00").map { case (m, t, o) =>
      Da00Msg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        lng(m \ "timestamp") * 1000000L, strField(m, "name"),
        strField(m, "axis_name"), flatten(m \ "data"))
    }
    val se00 = byId("se00").map { case (m, t, o) =>
      val tss = (m \ "timestamps") match {
        case JArray(xs) => Some(xs.map(x => lng(x)))
        case _          => None
      }
      Se00Msg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        lng(m \ "packet_timestamp") * 1000000L,
        (m \ "time_delta") match { case JNothing => 0.0; case v => num(v) },
        tss, flatten(m \ "values"))
    }
    val tdct = byId("tdct").map { case (m, t, o) =>
      val tss = (m \ "timestamps") match {
        case JArray(xs) => xs.map(x => lng(x))
        case _          => Nil
      }
      TdctMsg(t, strField(m, "source_name"), o, lng(m \ "kafka_timestamp"),
        tss.headOption.getOrElse(0L), tss)
    }

    Map(
      "f144" -> f144.toDF(), "ep01" -> ep01.toDF(), "al00" -> al00.toDF(),
      "ev44" -> ev44.toDF(), "ad00" -> ad00.toDF(), "da00" -> da00.toDF(),
      "se00" -> se00.toDF(), "tdct" -> tdct.toDF()
    )
  }
}
