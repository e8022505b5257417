package graft

import java.nio.file.{Files, Paths}
import java.util.UUID

import scala.collection.mutable

import graft.commands.{CommandProtocol, CommandTransport}
import graft.commands.CommandProtocol._

/** The service main end-to-end over an in-memory transport: CLI parsing
  * (reference option surface + duration grammar), then the full
  * idle → pl72 → answ → 6s4t(stop-now) → wrdn → idle choreography driven
  * through `Service.main` itself.
  */
class ServiceSpec extends SparkSpec {

  private final class MemTransport extends CommandTransport {
    val pool     = mutable.Queue.empty[Array[Byte]]
    val commands = mutable.Queue.empty[Array[Byte]]
    val out      = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    def pollJobPool(): Option[Array[Byte]] =
      if (pool.isEmpty) None else Some(pool.dequeue())
    def pollCommands(): Option[Array[Byte]] =
      if (commands.isEmpty) None else Some(commands.dequeue())
    def produce(kind: String, payload: Array[Byte]): Unit =
      synchronized { out += ((kind, payload)) }
    def commitJobPool(): Unit = ()
  }

  private val template =
    """{ "children": [ { "name": "entry", "type": "group", "children": [
      |  { "name": "speed", "type": "group", "children": [
      |    { "module": "f144", "config": { "source": "speed", "topic": "tp",
      |      "enable_epics_con_info": false, "enable_alarm_info": false } } ] }
      |] } ] }""".stripMargin

  test("parseArgs: required options, durations, defaults, errors") {
    assert(Service.parseArgs(Nil) == Left("--brokers is required"))
    assert(Service.parseArgs(Seq("--brokers", "b:9092"))
      == Left("--command-status-topic is required"))
    assert(Service.parseArgs(Seq("--nope")) == Left("unknown option '--nope'"))
    assert(Service.parseArgs(Seq("--brokers", "b", "--command-status-topic",
      "c", "--job-pool-topic", "j", "--status-master-interval", "zebra"))
      .swap.exists(_.contains("cannot parse duration")))
    val cfg = Service.parseArgs(Seq(
      "--brokers", "b1:9092,b2:9092",
      "--command-status-topic", "cst",
      "--job-pool-topic", "jp",
      "--hdf-output-prefix", "/tmp/x",
      "--service-name", "svc-e2e",
      "--status-master-interval", "1.5s",
      "--time-before-start", "500ms",
      "--time-after-stop", "2m",
      "--poll-interval", "0ms",
      "--max-ticks", "7")).toOption.get
    assert(cfg.brokers == "b1:9092,b2:9092")
    assert(cfg.statusMasterIntervalMs == 1500L)
    assert(cfg.timeBeforeStartMs == 500L)
    assert(cfg.timeAfterStopMs == 120000L)
    assert(cfg.pollIntervalMs == 0L)
    assert(cfg.maxTicks == 7L)
    assert(Service.parseArgs(Seq("--version")).toOption.exists(_.printVersion))
  }

  test("main runs the full start → write → stop → wrdn choreography") {
    val outRoot = Files.createTempDirectory("graft-service").toString
    val tr      = new MemTransport
    val jobId   = UUID.randomUUID().toString
    tr.pool += encodeRunStart(RunStart(10000, 15000, "run-e2e", "inst",
      template, jobId, "svc-e2e", "svcfile", ""))
    // stop-now lands once the service is writing
    tr.commands += encodeRunStop(RunStop(0L, "run-e2e", jobId, "svc-e2e",
      UUID.randomUUID().toString))

    val prev = Service.transportFactory
    Service.transportFactory = { cfg =>
      assert(cfg.brokers == "broker:9092")
      assert(cfg.serviceName == "svc-e2e")
      tr
    }
    try {
      // spark session already exists (SparkSpec); main's getOrCreate reuses it
      Service.main(Array(
        "--brokers", "broker:9092",
        "--command-status-topic", "cst",
        "--job-pool-topic", "jp",
        "--hdf-output-prefix", outRoot,
        "--service-name", "svc-e2e",
        "--status-master-interval", "1ms",
        "--poll-interval", "0ms",
        "--max-ticks", "6"))
    } finally Service.transportFactory = prev

    val kinds = tr.out.map(_._1)
    assert(kinds.contains("answ"), s"no answ in $kinds")
    assert(kinds.contains("wrdn"), s"no wrdn in $kinds")
    assert(kinds.contains("x5f2"), s"no heartbeat in $kinds")
    val answ = CommandProtocol.decodeAnswer(
      tr.out.find(_._1 == "answ").get._2).toOption.get
    assert(answ.success && answ.jobId == jobId)
    assert(answ.serviceId == "svc-e2e")
    val wrdn = CommandProtocol.decodeFinished(
      tr.out.find(_._1 == "wrdn").get._2).toOption.get
    assert(!wrdn.error && wrdn.jobId == jobId)
    // the run's output tree exists (stop-now still closes the structure)
    assert(Files.exists(Paths.get(s"$outRoot/svcfile/manifest.json")))
  }

  test("a finished job's counters stop reporting once the master is idle") {
    val outRoot = Files.createTempDirectory("graft-service").toString
    val tr      = new MemTransport
    val jobId   = UUID.randomUUID().toString
    tr.pool += encodeRunStart(RunStart(10000, 15000, "run-dereg", "inst",
      template, jobId, "svc-dereg", "svcfile", ""))
    // stop-now lands right after acceptance; the master returns to Idle
    // and currentJob → None a couple of ticks in
    tr.commands += encodeRunStop(RunStop(0L, "run-dereg", jobId, "svc-dereg",
      UUID.randomUUID().toString))

    val lines = mutable.ArrayBuffer.empty[String]
    val prevT = Service.transportFactory
    val prevC = Service.carbonSenderFactory
    Service.transportFactory = _ => tr
    Service.carbonSenderFactory = _ =>
      new graft.commands.MetricsReporter.CarbonTransport {
        def send(line: String): Unit = lines += line
      }
    try {
      // ~1 s per clock call → many carbon rounds across 40 ticks, nearly
      // all of them AFTER the job finished
      var now = 0L
      val cfg = Service.parseArgs(Seq(
        "--brokers", "b:9092",
        "--command-status-topic", "cst",
        "--job-pool-topic", "jp",
        "--hdf-output-prefix", outRoot,
        "--grafana-carbon-address", "carbon.example.org:2003",
        "--service-name", "svc-dereg",
        "--poll-interval", "0ms",
        "--max-ticks", "40")).toOption.get
      Service.run(spark, cfg, tr, clock = () => { now += 1000; now })
    } finally {
      Service.transportFactory = prevT
      Service.carbonSenderFactory = prevC
    }
    assert(tr.out.map(_._1).contains("wrdn"), "job never finished")
    // the job's counters reported while it was alive...
    def ts(l: String) = l.trim.split(' ').last.toLong
    val streamRounds = lines.filter(_.contains(".entry.speed."))
      .map(ts).distinct.sorted
    assert(streamRounds.nonEmpty, s"no stream counter lines at all: $lines")
    // ...but deregistration on idle stops them: without it every later
    // round (~12+ across 40 ticks) would keep pushing the frozen values
    assert(streamRounds.size <= 3,
      s"dead job's counters kept reporting: rounds at $streamRounds")
  }

  test("--grafana-carbon-address wires a 10s carbon reporter through the loop") {
    val outRoot = Files.createTempDirectory("graft-service").toString
    val tr      = new MemTransport
    val jobId   = UUID.randomUUID().toString
    tr.pool += encodeRunStart(RunStart(10000, 15000, "run-carbon", "inst",
      template, jobId, "svc-carbon", "svcfile", ""))

    val lines    = mutable.ArrayBuffer.empty[String]
    val prevT    = Service.transportFactory
    val prevC    = Service.carbonSenderFactory
    Service.transportFactory = _ => tr
    Service.carbonSenderFactory = { addr =>
      assert(addr == "carbon.example.org:2003")
      new graft.commands.MetricsReporter.CarbonTransport {
        def send(line: String): Unit = lines += line
      }
    }
    try {
      // a fake clock stepping 6 s per tick crosses the 10 s carbon cadence
      // twice in 5 ticks; the job is accepted on tick 1 so its stream
      // counters are registered before the second report round
      var now = 0L
      val cfg = Service.parseArgs(Seq(
        "--brokers", "b:9092",
        "--command-status-topic", "cst",
        "--job-pool-topic", "jp",
        "--hdf-output-prefix", outRoot,
        "--grafana-carbon-address", "carbon.example.org:2003",
        "--service-name", "svc-carbon",
        "--poll-interval", "0ms",
        "--max-ticks", "5")).toOption.get
      Service.run(spark, cfg, tr, clock = () => { now += 6000; now })
    } finally {
      Service.transportFactory = prevT
      Service.carbonSenderFactory = prevC
    }
    // graphite plaintext lines carrying the job's stream counters under
    // the app.host.service prefix
    assert(lines.nonEmpty, "no carbon lines produced")
    assert(lines.forall(_.matches("""[\w.\-]+ -?\d+ \d+\n""")),
      s"bad graphite line in $lines")
    assert(lines.exists(_.contains(".svc-carbon.entry.speed.")),
      s"no stream counter lines in $lines")
  }
}
