package graft.commands

import java.util.UUID

import com.google.flatbuffers.FlatBufferBuilder

import graft.functions.FlatBufferReader.Reader

/** The Kafka command protocol (SURVEY §1.3 command schemas, §3.1/§3.3):
  * inbound `pl72` RunStart / `6s4t` RunStop, outbound `answ` answers,
  * `x5f2` periodic status, `wrdn` finished-writing
  * (`src/CommandSystem/Parser.cpp:13-18,53-155`,
  * `documentation/commands.md:16-24`).
  *
  * Wire format: FlatBuffers over the same hand-rolled reader/builder as the
  * data schemas; field ids follow the streaming-data-types declaration
  * order noted per codec.
  */
object CommandProtocol {

  /** pl72 RunStart payload (`Parser::extractStartMessage`,
    * `src/CommandSystem/Parser.cpp:53-88`). Times are milliseconds.
    */
  final case class RunStart(
      startTimeMs: Long,
      stopTimeMs: Long,
      runName: String,
      instrumentName: String,
      nexusStructure: String,
      jobId: String,
      serviceId: String,
      filename: String,
      controlTopic: String
  )

  /** 6s4t RunStop payload (`Parser::extractStopMessage`,
    * `src/CommandSystem/Parser.cpp:90-108`).
    */
  final case class RunStop(
      stopTimeMs: Long,
      runName: String,
      jobId: String,
      serviceId: String,
      commandId: String
  )

  // pl72 field ids: start_time, stop_time, run_name, instrument_name,
  // nexus_structure, job_id, broker, service_id, filename, control_topic
  private object Pl72 {
    val StartTime = 0; val StopTime = 1; val RunName = 2; val Instrument = 3
    val NexusStructure = 4; val JobId = 5; val Broker = 6; val ServiceId = 7
    val Filename = 8; val ControlTopic = 9
  }
  // 6s4t field ids: stop_time, run_name, job_id, service_id, command_id
  private object S6s4t {
    val StopTime = 0; val RunName = 1; val JobId = 2; val ServiceId = 3
    val CommandId = 4
  }

  def encodeRunStart(m: RunStart): Array[Byte] = {
    val b    = new FlatBufferBuilder(1024)
    val strs = Map(
      Pl72.RunName -> m.runName, Pl72.Instrument -> m.instrumentName,
      Pl72.NexusStructure -> m.nexusStructure, Pl72.JobId -> m.jobId,
      Pl72.ServiceId -> m.serviceId, Pl72.Filename -> m.filename,
      Pl72.ControlTopic -> m.controlTopic
    ).map { case (id, s) => id -> b.createString(Option(s).getOrElse("")) }
    b.startTable(10)
    b.addLong(Pl72.StartTime, m.startTimeMs, 0L)
    b.addLong(Pl72.StopTime, m.stopTimeMs, 0L)
    strs.foreach { case (id, off) => b.addOffset(id, off, 0) }
    b.finish(b.endTable(), "pl72")
    b.sizedByteArray()
  }

  def encodeRunStop(m: RunStop): Array[Byte] = {
    val b    = new FlatBufferBuilder(256)
    val strs = Map(
      S6s4t.RunName -> m.runName, S6s4t.JobId -> m.jobId,
      S6s4t.ServiceId -> m.serviceId, S6s4t.CommandId -> m.commandId
    ).map { case (id, s) => id -> b.createString(Option(s).getOrElse("")) }
    b.startTable(5)
    b.addLong(S6s4t.StopTime, m.stopTimeMs, 0L)
    strs.foreach { case (id, off) => b.addOffset(id, off, 0) }
    b.finish(b.endTable(), "6s4t")
    b.sizedByteArray()
  }

  private def str(r: Reader, root: Int, id: Int): String = {
    val p = r.field(root, id)
    if (p < 0) "" else r.string(p)
  }
  private def lng(r: Reader, root: Int, id: Int): Long = {
    val p = r.field(root, id)
    if (p < 0) 0L else r.i64(p)
  }

  def schemaId(bytes: Array[Byte]): String =
    if (bytes.length < 8) "" else new Reader(bytes).fileIdentifier

  def decodeRunStart(bytes: Array[Byte]): Either[String, RunStart] = {
    if (schemaId(bytes) != "pl72") return Left("not a pl72 buffer")
    val r = new Reader(bytes); val root = r.rootTable
    try Right(RunStart(
      lng(r, root, Pl72.StartTime), lng(r, root, Pl72.StopTime),
      str(r, root, Pl72.RunName), str(r, root, Pl72.Instrument),
      str(r, root, Pl72.NexusStructure), str(r, root, Pl72.JobId),
      str(r, root, Pl72.ServiceId), str(r, root, Pl72.Filename),
      str(r, root, Pl72.ControlTopic)))
    catch { case _: IndexOutOfBoundsException => Left("NotValidFlatbuffer") }
  }

  def decodeRunStop(bytes: Array[Byte]): Either[String, RunStop] = {
    if (schemaId(bytes) != "6s4t") return Left("not a 6s4t buffer")
    val r = new Reader(bytes); val root = r.rootTable
    try Right(RunStop(
      lng(r, root, S6s4t.StopTime), str(r, root, S6s4t.RunName),
      str(r, root, S6s4t.JobId), str(r, root, S6s4t.ServiceId),
      str(r, root, S6s4t.CommandId)))
    catch { case _: IndexOutOfBoundsException => Left("NotValidFlatbuffer") }
  }

  // ---- outbound -------------------------------------------------------

  /** answ ActionType / ActionOutcome enums (streaming-data-types
    * `answ_action_response.fbs`; usage in
    * `src/CommandSystem/FeedbackProducer.cpp:48-53` and
    * `tests/CommandSystem/HandlerTests.cpp:187-188`).
    */
  object ActionType { val StartJob: Short = 0; val SetStopTime: Short = 1 }
  object ActionOutcome { val Success: Short = 0; val Failure: Short = 1 }

  /** answ command answer, upstream ActionResponse layout
    * (`FeedbackProducer.cpp:59-61` `CreateActionResponse` argument order):
    * field ids service_id@0, job_id@1, action@2 (short enum), outcome@3
    * (short enum), status_code@4 (i32), stop_time@5 (ms, i64), message@6,
    * command_id@7.
    */
  def encodeAnswer(serviceId: String, jobId: String, action: Short,
      outcome: Short, statusCode: Int, stopTimeMs: Long, message: String,
      commandId: String): Array[Byte] = {
    val b  = new FlatBufferBuilder(256)
    val si = b.createString(Option(serviceId).getOrElse(""))
    val ji = b.createString(Option(jobId).getOrElse(""))
    val ms = b.createString(Option(message).getOrElse(""))
    val ci = b.createString(Option(commandId).getOrElse(""))
    b.startTable(8)
    b.addOffset(0, si, 0); b.addOffset(1, ji, 0)
    b.addShort(2, action, 0); b.addShort(3, outcome, 0)
    b.addInt(4, statusCode, 0); b.addLong(5, stopTimeMs, 0L)
    b.addOffset(6, ms, 0); b.addOffset(7, ci, 0)
    b.finish(b.endTable(), "answ")
    b.sizedByteArray()
  }

  /** x5f2 periodic status. Field ids: software_name, software_version,
    * service_id, host_name, process_id, update_interval, status_json
    * (`src/Status/StatusReporter` analog).
    */
  def encodeStatus(serviceId: String, statusJson: String,
      updateIntervalMs: Long): Array[Byte] = {
    val b  = new FlatBufferBuilder(512)
    val sw = b.createString("graft"); val ver = b.createString("0.1")
    val si = b.createString(serviceId)
    val hn = b.createString(java.net.InetAddress.getLocalHost.getHostName)
    val js = b.createString(statusJson)
    b.startTable(7)
    b.addOffset(0, sw, 0); b.addOffset(1, ver, 0); b.addOffset(2, si, 0)
    b.addOffset(3, hn, 0); b.addInt(4, ProcessHandle.current().pid().toInt, 0)
    b.addLong(5, updateIntervalMs, 0L); b.addOffset(6, js, 0)
    b.finish(b.endTable(), "x5f2")
    b.sizedByteArray()
  }

  /** wrdn finished-writing. Field ids: service_id, job_id, error_encountered,
    * file_name, metadata, message (`src/CommandSystem/Handler.cpp:107-125`).
    */
  def encodeFinished(serviceId: String, jobId: String, error: Boolean,
      fileName: String, metadata: String, message: String): Array[Byte] = {
    val b  = new FlatBufferBuilder(512)
    val si = b.createString(serviceId); val ji = b.createString(jobId)
    val fn = b.createString(fileName); val md = b.createString(metadata)
    val ms = b.createString(message)
    b.startTable(6)
    b.addOffset(0, si, 0); b.addOffset(1, ji, 0)
    b.addByte(2, (if (error) 1 else 0).toByte, 0)
    b.addOffset(3, fn, 0); b.addOffset(4, md, 0); b.addOffset(5, ms, 0)
    b.finish(b.endTable(), "wrdn")
    b.sizedByteArray()
  }

  /** UUID validation for job/command ids (`Handler.cpp:138-146`). */
  def isValidUuid(s: String): Boolean =
    try { UUID.fromString(s); true } catch { case _: IllegalArgumentException => false }

  // ---- outbound decoders ----------------------------------------------
  // The monitoring/orchestration side of a deployment consumes answ/x5f2/
  // wrdn; full codecs keep the protocol surface symmetric and testable.

  final case class Answer(serviceId: String, jobId: String, action: Short,
      outcome: Short, statusCode: Int, stopTimeMs: Long, message: String,
      commandId: String) {
    def success: Boolean = outcome == ActionOutcome.Success
  }
  final case class Status(serviceId: String, statusJson: String,
      updateIntervalMs: Long)
  final case class Finished(serviceId: String, jobId: String, error: Boolean,
      fileName: String, metadata: String, message: String)

  def decodeAnswer(bytes: Array[Byte]): Either[String, Answer] = {
    if (schemaId(bytes) != "answ") return Left("not an answ buffer")
    val r = new Reader(bytes); val root = r.rootTable
    def shrt(id: Int): Short = {
      val p = r.field(root, id); if (p < 0) 0 else r.i16(p)
    }
    def int(id: Int): Int = {
      val p = r.field(root, id); if (p < 0) 0 else r.i32(p)
    }
    try Right(Answer(str(r, root, 0), str(r, root, 1), shrt(2), shrt(3),
      int(4), lng(r, root, 5), str(r, root, 6), str(r, root, 7)))
    catch { case _: IndexOutOfBoundsException => Left("NotValidFlatbuffer") }
  }

  def decodeStatus(bytes: Array[Byte]): Either[String, Status] = {
    if (schemaId(bytes) != "x5f2") return Left("not an x5f2 buffer")
    val r = new Reader(bytes); val root = r.rootTable
    try Right(Status(str(r, root, 2), str(r, root, 6), lng(r, root, 5)))
    catch { case _: IndexOutOfBoundsException => Left("NotValidFlatbuffer") }
  }

  def decodeFinished(bytes: Array[Byte]): Either[String, Finished] = {
    if (schemaId(bytes) != "wrdn") return Left("not a wrdn buffer")
    val r = new Reader(bytes); val root = r.rootTable
    try {
      val er = r.field(root, 2)
      Right(Finished(str(r, root, 0), str(r, root, 1),
        er >= 0 && r.i8(er) != 0, str(r, root, 3), str(r, root, 4),
        str(r, root, 5)))
    } catch { case _: IndexOutOfBoundsException => Left("NotValidFlatbuffer") }
  }
}
