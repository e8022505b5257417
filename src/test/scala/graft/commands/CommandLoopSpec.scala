package graft.commands

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.commands.CommandProtocol._
import graft.functions.FlatBufferReader.Reader
import graft.sources.Fixtures.{Ev44Msg, F144Msg}
import graft.streaming.StreamingJob

/** End-to-end command choreography over an in-memory transport — the
  * protocol sequence of the reference's integration test
  * (`integration-tests/test_filewriter.py:83-144`): idle x5f2 heartbeat,
  * pl72 → answ(started), x5f2 while writing, 6s4t → answ(stop set), data
  * past stop finishing every stream → wrdn, back to idle — with real
  * MemoryStream streaming queries feeding two schemas (f144 + ev44)
  * through `StreamingJob.attach`.
  */
class CommandLoopSpec extends SparkSpec {
  import spark.implicits._

  private final class MemTransport extends CommandTransport {
    val pool      = mutable.Queue.empty[Array[Byte]]
    val commands  = mutable.Queue.empty[Array[Byte]]
    val out       = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    val topicSwitches = mutable.ArrayBuffer.empty[Option[String]]
    var committed = 0
    override def useControlTopic(topic: Option[String]): Unit =
      topicSwitches += topic
    def pollJobPool(): Option[Array[Byte]] =
      if (pool.isEmpty) None else Some(pool.dequeue())
    def pollCommands(): Option[Array[Byte]] =
      if (commands.isEmpty) None else Some(commands.dequeue())
    def produce(kind: String, payload: Array[Byte]): Unit = out += ((kind, payload))
    def commitJobPool(): Unit = committed += 1
  }

  private def strField(bytes: Array[Byte], id: Int): String = {
    val r = new Reader(bytes); val p = r.field(r.rootTable, id)
    if (p < 0) "" else r.string(p)
  }
  private def byteField(bytes: Array[Byte], id: Int): Int = {
    val r = new Reader(bytes); val p = r.field(r.rootTable, id)
    if (p < 0) 0 else r.i8(p).toInt
  }

  private val template =
    """{ "children": [
      |  { "name": "entry", "type": "group", "children": [
      |    { "name": "speed", "type": "group", "children": [
      |      { "module": "f144",
      |        "config": { "source": "speed", "topic": "tp",
      |                    "enable_epics_con_info": false,
      |                    "enable_alarm_info": false } } ] },
      |    { "name": "events", "type": "group", "children": [
      |      { "module": "ev44", "config": { "source": "det", "topic": "tp" } } ] }
      |  ] } ] }""".stripMargin

  test("pl72 → answ → x5f2 → 6s4t → answ → wrdn over two attached schemas") {
    val outRoot = Files.createTempDirectory("graft-cmd").toString
    val master  = new Master(spark, "svc-1", outRoot)
    val tr      = new MemTransport
    val loop    = new CommandLoop(master, tr, statusIntervalMs = 1000)

    // idle heartbeat before any command (test_filewriter.py:61)
    assert(loop.tick(nowMs = 1000) == Seq("x5f2"))
    assert(strField(tr.out.last._2, 6).contains("\"state\":\"idle\""))

    // pl72 start with window [10 s, 15 s]
    val jobId = java.util.UUID.randomUUID().toString
    tr.pool += encodeRunStart(RunStart(10000, 15000, "run-1", "inst",
      template, jobId, "svc-1", "outfile", "ctl"))
    assert(loop.tick(1100) == Seq("answ"))
    val startAnsw = decodeAnswer(tr.out.last._2).toOption.get
    assert(startAnsw.success, "start must be accepted")
    assert(startAnsw.action == ActionType.StartJob)
    assert(startAnsw.serviceId == "svc-1" && startAnsw.jobId == jobId)
    assert(tr.committed == 1, "pool offset committed after accepting the job")
    assert(tr.topicSwitches.toSeq == Seq(Some("ctl")),
      "commands switch to the run's control topic")
    val job = master.currentJob.getOrElse(fail("not writing"))

    // two schemas flow through real streaming queries
    val f144In = MemoryStream[F144Msg](spark)
    val ev44In = MemoryStream[Ev44Msg](spark)
    val q1 = StreamingJob.attach(job, "f144", f144In.toDF(), triggerMs = 100)
    val q2 = StreamingJob.attach(job, "ev44", ev44In.toDF(), triggerMs = 100)
    try {
      f144In.addData(
        F144Msg("tp", "speed", 0, 10100, 10100000000L, 10.0),
        F144Msg("tp", "speed", 1, 10200, 10200000000L, 15.0))
      ev44In.addData(
        Ev44Msg("tp", "det", 0, 10150, 10150000000L, Seq(10150000000L),
          Seq(0), Seq(1, 2), Seq(2, 3)))
      q1.processAllAvailable(); q2.processAllAvailable()

      // writing heartbeat carries per-stream counters + file size (A3/A4)
      assert(loop.tick(2200) == Seq("x5f2"))
      val writingStatus = strField(tr.out.last._2, 6)
      assert(writingStatus.contains("\"state\":\"writing\""))
      assert(writingStatus.contains("\"file_size\":"))
      assert(writingStatus.contains("entry/speed"))

      // 6s4t moves the stop earlier → answ(success)
      tr.commands += encodeRunStop(RunStop(12000, "run-1", jobId, "svc-1", "cmd-7"))
      assert(loop.tick(2300) == Seq("answ"))
      val stopAnsw = decodeAnswer(tr.out.last._2).toOption.get
      assert(stopAnsw.success, "stop-time update accepted")
      assert(stopAnsw.action == ActionType.SetStopTime)
      assert(stopAnsw.stopTimeMs == 12000 && stopAnsw.commandId == "cmd-7")
      assert(job.stopTimeMs == 12000)

      // data past the new stop finishes both streams → stop monitor → wrdn
      f144In.addData(F144Msg("tp", "speed", 2, 12600, 12600000000L, 99.0))
      ev44In.addData(Ev44Msg("tp", "det", 1, 12700, 12700000000L,
        Seq(12700000000L), Seq(0), Seq(9), Seq(10)))
      q1.processAllAvailable(); q2.processAllAvailable()
      val kinds = loop.tick(3400)
      assert(kinds == Seq("wrdn", "x5f2"), s"got $kinds")
    } finally { q1.stop(); q2.stop() }

    val wrdn = tr.out.reverse.find(_._1 == "wrdn").get._2
    assert(strField(wrdn, 1) == jobId)
    assert(byteField(wrdn, 2) == 0, "no error on completion")
    assert(master.currentJob.isEmpty, "back to idle after wrdn")
    assert(strField(tr.out.last._2, 6).contains("\"state\":\"idle\""))
    assert(tr.topicSwitches.toSeq == Seq(Some("ctl"), None),
      "control topic reverts after wrdn")

    // protocol order exactly as the integration test expects
    assert(tr.out.map(_._1).toSeq ==
      Seq("x5f2", "answ", "x5f2", "answ", "wrdn", "x5f2"))

    // and the data really landed
    val f = spark.read.parquet(s"$outRoot/outfile/data/entry/speed/data")
      .orderBy("row").collect()
    assert(f.map(_.getAs[Double]("value")).toSeq == Seq(10.0, 15.0))
    // the beyond-stop ev44 message only finishes the stream — its events
    // are dropped (strict finish, F2/F6)
    val ev = spark.read.parquet(s"$outRoot/outfile/data/entry/events/events")
      .orderBy("row").collect()
    assert(ev.map(_.getAs[Int]("event_time_offset")).toSeq == Seq(1, 2))
  }

  test("pool rejoin: a finished worker accepts the next job (test_filewriter.py:197)") {
    val outRoot = Files.createTempDirectory("graft-cmd").toString
    val master  = new Master(spark, "svc-3", outRoot)
    val tr      = new MemTransport
    val loop    = new CommandLoop(master, tr, statusIntervalMs = 100000)
    def startJob(file: String): String = {
      val id = java.util.UUID.randomUUID().toString
      tr.pool += encodeRunStart(RunStart(10000, 15000, "r", "i", template,
        id, "svc-3", file, "ctl"))
      id
    }
    val id1 = startJob("f1")
    loop.tick(1)
    val job1 = master.currentJob.get
    job1.processBatch("f144", Seq(
      F144Msg("tp", "speed", 0, 10100, 10100000000L, 1.0),
      F144Msg("tp", "speed", 1, 16000, 16000000000L, 9.0)).toDF())
    job1.processBatch("ev44", Seq(
      Ev44Msg("tp", "det", 0, 16000, 16000000000L, Seq(16000000000L),
        Seq(0), Seq(1), Seq(2))).toDF())
    assert(loop.tick(2).contains("wrdn"))
    // idle again: the next pool record is picked up on the following tick
    val id2 = startJob("f2")
    loop.tick(3)
    assert(master.currentJob.nonEmpty)
    assert(master.currentState.asInstanceOf[master.Writing].jobId == id2)
    assert(tr.committed == 2)
    assert(id1 != id2)
    // both outputs exist independently
    assert(Files.exists(java.nio.file.Paths.get(s"$outRoot/f1/manifest.json")))
    assert(Files.exists(java.nio.file.Paths.get(s"$outRoot/f2/manifest.json")))
  }

  test("second pl72 while writing is rejected (at-most-one job per worker)") {
    val outRoot = Files.createTempDirectory("graft-cmd").toString
    val master  = new Master(spark, "svc-2", outRoot)
    val tr      = new MemTransport
    val loop    = new CommandLoop(master, tr, statusIntervalMs = 100000)
    val id1     = java.util.UUID.randomUUID().toString
    tr.pool += encodeRunStart(RunStart(10000, 15000, "r", "i", template,
      id1, "svc-2", "f1", "ctl"))
    loop.tick(1)
    assert(master.currentJob.nonEmpty)
    // while writing the pool is NOT polled — the job-pool record stays put
    tr.pool += encodeRunStart(RunStart(10000, 15000, "r", "i", template,
      java.util.UUID.randomUUID().toString, "svc-2", "f2", "ctl"))
    loop.tick(2)
    assert(tr.pool.size == 1, "job pool untouched while writing")
    assert(tr.committed == 1)
  }
}
