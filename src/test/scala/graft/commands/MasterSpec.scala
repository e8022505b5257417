package graft.commands

import java.nio.file.Files
import java.util.UUID

import graft.SparkSpec
import graft.sources.Fixtures.F144Msg

/** Command-protocol round-trips and the Master job lifecycle — the
  * integration-test tier of the reference
  * (`integration-tests/test_filewriter.py`: start → answ, stop → answ +
  * wrdn, invalid input rejection) without Kafka.
  */
class MasterSpec extends SparkSpec {
  import CommandProtocol._
  import spark.implicits._

  private val template =
    """{ "children": [ { "name": "entry", "type": "group", "children": [
      |  { "name": "speed", "type": "group", "children": [
      |    { "module": "f144", "config": { "source": "speed", "topic": "tp",
      |      "enable_epics_con_info": false, "enable_alarm_info": false } } ] }
      |] } ] }""".stripMargin

  private def newMaster() = new Master(
    spark, "svc-1", Files.createTempDirectory("graft-master").toString)

  test("pl72 and 6s4t round-trip through the wire format") {
    val rs = RunStart(10000, 15000, "run", "instr", template,
      UUID.randomUUID().toString, "svc-1", "out.nxs", "ctrl")
    assert(decodeRunStart(encodeRunStart(rs)) == Right(rs))
    val st = RunStop(14000, "run", rs.jobId, "svc-1", UUID.randomUUID().toString)
    assert(decodeRunStop(encodeRunStop(st)) == Right(st))
    assert(schemaId(encodeRunStart(rs)) == "pl72")
    val answ = encodeAnswer("s", "j", ActionType.StartJob,
      ActionOutcome.Success, 0, 15000L, "m", "c")
    assert(schemaId(answ) == "answ")
    assert(decodeAnswer(answ) == Right(Answer("s", "j", ActionType.StartJob,
      ActionOutcome.Success, 0, 15000L, "m", "c")))
    assert(decodeAnswer(answ).toOption.get.success)
    assert(schemaId(encodeFinished("s", "j", error = false, "f", "{}", "m")) == "wrdn")
    assert(schemaId(statusBytes) == "x5f2")
  }
  private def statusBytes = newMaster().statusMessage()

  test("full lifecycle: start → write → stop-now → wrdn, back to idle") {
    val master = newMaster()
    val jobId  = UUID.randomUUID().toString
    val rs = RunStart(10000, 15000, "run", "instr", template, jobId,
      "svc-1", "file1", "ctrl")
    val out1 = master.handle(encodeRunStart(rs))
    assert(out1.map(_.kind) == Seq("answ"))
    assert(master.currentState != master.Idle)

    master.currentJob.get.processBatch("f144",
      Seq(F144Msg("tp", "speed", 0, 10100, 10100000000L, 10.0)).toDF())

    // second start while writing → rejected
    val rej = master.handle(encodeRunStart(rs.copy(jobId = UUID.randomUUID().toString)))
    assert(rej.map(_.kind) == Seq("answ"))

    // stop now (stop_time = 0)
    val out2 = master.handle(encodeRunStop(
      encodeStop(jobId, stopMs = 0)))
    assert(out2.map(_.kind) == Seq("wrdn"))
    assert(master.currentState == master.Idle)
  }

  private def encodeStop(jobId: String, stopMs: Long) =
    RunStop(stopMs, "run", jobId, "svc-1", UUID.randomUUID().toString)

  test("wrdn tells the truth: job path, native .h5, errors, crash resilience") {
    val master = newMaster()
    val jobId  = UUID.randomUUID().toString
    master.handle(encodeRunStart(RunStart(10000, 15000, "run", "instr",
      template, jobId, "svc-1", "run7.nxs", "ctrl")))
    val job = master.currentJob.get
    job.processBatch("f144",
      Seq(F144Msg("tp", "speed", 0, 10100, 10100000000L, 10.0)).toDF())
    val fin = decodeFinished(
      master.handle(encodeRunStop(encodeStop(jobId, 0))).head.payload)
      .toOption.get
    // file_name names THIS job's output, not the shared root
    assert(fin.fileName == job.outDir && fin.fileName.endsWith("/run7.nxs"))
    assert(!fin.error)
    // the native artifact the reference workflow names exists by default
    assert(Files.exists(java.nio.file.Paths.get(s"${job.outDir}/run7.nxs")),
      "service-mode finish must emit the native .h5")

    // a crash inside finish() must still idle the service and REPORT it
    val m2 = newMaster()
    val j2 = UUID.randomUUID().toString
    m2.handle(encodeRunStart(RunStart(10000, 15000, "run", "instr",
      template, j2, "svc-1", "run8.nxs", "ctrl")))
    val job2 = m2.currentJob.get
    job2.processBatch("f144",
      Seq(F144Msg("tp", "speed", 0, 10100, 10100000000L, 1.0)).toDF())
    job2.crashHook = p => if (p == "finish:seeded") throw new RuntimeException("boom")
    val fin2 = decodeFinished(
      m2.handle(encodeRunStop(encodeStop(j2, 0))).head.payload).toOption.get
    assert(fin2.error, "a finish failure must surface as error_encountered")
    assert(fin2.message.contains("boom"))
    assert(m2.currentState == m2.Idle, "the service must not stay stuck in Writing")
  }

  test("6s4t failure answers echo the command's own command id") {
    val master = newMaster()
    val stop = encodeStop(UUID.randomUUID().toString, 0) // nothing writing
    val answ = decodeAnswer(
      master.handle(encodeRunStop(stop)).head.payload).toOption.get
    assert(!answ.success)
    assert(answ.commandId == stop.commandId,
      s"failure answer must correlate by command id, got ${answ.commandId}")
  }

  test("6s4t updates the running job's stop time") {
    val master = newMaster()
    val jobId  = UUID.randomUUID().toString
    master.handle(encodeRunStart(RunStart(10000, 15000, "r", "i", template,
      jobId, "svc-1", "file2", "ctrl")))
    val out = master.handle(encodeRunStop(encodeStop(jobId, stopMs = 13000)))
    assert(out.map(_.kind) == Seq("answ"))
    assert(master.currentJob.get.stopTimeMs == 13000)
    // mismatched job id rejected
    val out2 = master.handle(encodeRunStop(encodeStop(UUID.randomUUID().toString, 12000)))
    assert(master.currentJob.get.stopTimeMs == 13000)
    assert(out2.map(_.kind) == Seq("answ"))
  }

  test("stop monitor finishes the job when all streams pass stop time") {
    val master = newMaster()
    val jobId  = UUID.randomUUID().toString
    master.handle(encodeRunStart(RunStart(10000, 15000, "r", "i", template,
      jobId, "svc-1", "file3", "ctrl")))
    val job = master.currentJob.get
    job.processBatch("f144",
      Seq(F144Msg("tp", "speed", 0, 10100, 10100000000L, 1.0),
        F144Msg("tp", "speed", 1, 16000, 16000000000L, 2.0)).toDF())
    assert(job.allStreamsFinished)
    val out = master.checkProgress(nowMs = 12000)
    assert(out.map(_.kind) == Seq("wrdn"))
    assert(master.currentState == master.Idle)
  }

  test("status message carries per-stream write counters") {
    val master = newMaster()
    val jobId  = UUID.randomUUID().toString
    master.handle(encodeRunStart(RunStart(10000, 15000, "r", "i", template,
      jobId, "svc-1", "file4", "ctrl")))
    master.currentJob.get.processBatch("f144",
      Seq(F144Msg("tp", "speed", 0, 10100, 10100000000L, 1.0)).toDF())
    val bytes = master.statusMessage()
    assert(schemaId(bytes) == "x5f2")
    val r    = new graft.functions.FlatBufferReader.Reader(bytes)
    val root = r.rootTable
    val json = r.string(r.field(root, 6))
    assert(json.contains("\"state\":\"writing\""))
    assert(json.contains("\"data\":1"))
  }

  test("invalid starts rejected: bad UUID, empty structure, bad window") {
    val master = newMaster()
    val good = RunStart(10000, 15000, "r", "i", template,
      UUID.randomUUID().toString, "svc-1", "f", "ctrl")
    assert(master.handle(encodeRunStart(good.copy(jobId = "nope"))).map(_.kind) == Seq("answ"))
    assert(master.currentState == master.Idle)
    assert(master.handle(encodeRunStart(good.copy(nexusStructure = ""))).nonEmpty)
    assert(master.currentState == master.Idle)
    assert(master.handle(encodeRunStart(good.copy(stopTimeMs = 9000))).nonEmpty)
    assert(master.currentState == master.Idle)
    assert(master.handle("garbage".getBytes).nonEmpty)
  }
}
