package graft.commands

import org.scalatest.funsuite.AnyFunSuite

import MetricsReporter._

/** The push-metrics seam over in-memory transports: reference cadences
  * (carbon 10 s / log 60 s, `apps/kafka-to-nexus.cpp:313-323`), the
  * Carbon plaintext line format (`CarbonSink.cpp:6-15`), change-only log
  * reporting (`LogSink.cpp:15-30`), dotted registrar prefixes
  * (`Registrar.cpp:14-48`), and the unhealthy-sink skip
  * (`Reporter.cpp:7-21`).
  */
class MetricsReporterSpec extends AnyFunSuite {

  test("carbon reporter pushes all metrics at the 10 s cadence in graphite format") {
    val lines  = collection.mutable.ArrayBuffer.empty[String]
    val carbon = new Reporter(new CarbonSink(lines += _), periodMs = 10000)
    var writes = 0L; var errors = 0L
    val root = new Registrar(appPrefix("kafka-to-nexus", "host.example.org"),
      Seq(carbon))
    val stream = root.getNewRegistrar("speed")
    stream.registerMetric(Metric("writes_done", "writes")(() => writes))
    stream.registerMetric(Metric("write_errors", "errors")(() => errors))

    assert(carbon.tick(0L))      // first tick reports immediately
    writes = 5
    assert(!carbon.tick(5000L))  // within the period: nothing
    assert(carbon.tick(10000L))  // cadence boundary
    writes = 7; errors = 1
    assert(!carbon.tick(19999L))
    assert(carbon.tick(20000L))

    // three rounds × two metrics, fully-qualified dotted names, epoch secs
    assert(lines.size == 6)
    val exp = Seq(
      "kafka-to-nexus.host_example_org.speed.writes_done 0 0\n",
      "kafka-to-nexus.host_example_org.speed.write_errors 0 0\n",
      "kafka-to-nexus.host_example_org.speed.writes_done 5 10\n",
      "kafka-to-nexus.host_example_org.speed.write_errors 0 10\n",
      "kafka-to-nexus.host_example_org.speed.writes_done 7 20\n",
      "kafka-to-nexus.host_example_org.speed.write_errors 1 20\n")
    assert(lines.toSeq == exp)
  }

  test("log reporter fires at 60 s and reports only changed metrics with deltas") {
    val logged = collection.mutable.ArrayBuffer.empty[(Severity, String)]
    // synthetic clock: registration seeds the log-window baseline at 0
    val log = new Reporter(new LogSink((s, m) => logged += ((s, m))),
      periodMs = 60000, clock = () => 0L)
    var n = 0L
    new Registrar("app", Seq(log))
      .registerMetric(Metric("events", "event count", Severity.Info)(() => n))

    n = 42
    assert(log.tick(60000L))
    assert(logged.size == 1)
    assert(logged.head._1 == Severity.Info)
    assert(logged.head._2.contains("42 events of type \"app.events\""))
    assert(logged.head._2.contains("In the past 60000 ms"))

    // unchanged value → silent round
    assert(log.tick(120000L))
    assert(logged.size == 1)

    // delta since the LAST report, not since zero
    n = 50
    assert(log.tick(180000L))
    assert(logged.size == 2)
    assert(logged(1)._2.contains("8 events of type"))
    assert(logged(1)._2.contains("In the past 120000 ms"))
  }

  test("an unhealthy sink skips the round and surfaces the reference error line") {
    var healthy = false
    val lines   = collection.mutable.ArrayBuffer.empty[String]
    val errs    = collection.mutable.ArrayBuffer.empty[String]
    val rep = new Reporter(new CarbonSink(lines += _, () => healthy),
      periodMs = 10000, onUnhealthy = errs += _)
    new Registrar("p", Seq(rep)).registerMetric(Metric("m", "d")(() => 1L))
    assert(rep.tick(0L))
    assert(lines.isEmpty && errs == Seq("Unable to push metrics to the carbon sink."))
    healthy = true
    assert(rep.tick(10000L))
    assert(lines.size == 1)
  }

  test("reconnecting transport: outages mark unhealthy, never throw; " +
    "malformed addresses fail fast") {
    // nothing listens on this port: connect fails → unhealthy, and the
    // reporter routes the round to onUnhealthy instead of dying
    val t = new ReconnectingCarbonTransport("127.0.0.1:1", connectTimeoutMs = 200)
    assert(!t.healthy)
    t.send("dropped 1 0\n") // disconnected send is a silent no-op
    val errs = collection.mutable.ArrayBuffer.empty[String]
    val rep  = new Reporter(new CarbonSink(t.send, () => t.healthy),
      periodMs = 1000, onUnhealthy = errs += _, clock = () => 0L)
    new Registrar("p", Seq(rep)).registerMetric(Metric("m", "d")(() => 1L))
    assert(rep.tick(0L))
    assert(errs == Seq("Unable to push metrics to the carbon sink."))
    intercept[IllegalArgumentException](new ReconnectingCarbonTransport("nocolon"))
    intercept[IllegalArgumentException](new ReconnectingCarbonTransport("host:"))
  }

  test("send failure closes the dead connection and the next round redials") {
    val server = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getByName("127.0.0.1"))
    server.setSoTimeout(10000)
    try {
      val t = new ReconnectingCarbonTransport(
        s"127.0.0.1:${server.getLocalPort}", connectTimeoutMs = 2000)
      assert(t.healthy)
      val s1 = server.accept()
      t.send("a 1 0\n")
      val in1 = new java.io.BufferedReader(
        new java.io.InputStreamReader(s1.getInputStream))
      assert(in1.readLine() == "a 1 0")
      // server kills the connection: writes start failing once the RST
      // lands; the transport must CLOSE its side, not just null the writer
      s1.close()
      var i = 0
      while (i < 100 && t.isConnected) { t.send(s"b $i 0\n"); Thread.sleep(5); i += 1 }
      assert(!t.isConnected, "broken connection never detected")
      // next health probe redials and the new connection carries lines
      assert(t.healthy)
      val s2 = server.accept()
      t.send("c 1 0\n")
      val in2 = new java.io.BufferedReader(
        new java.io.InputStreamReader(s2.getInputStream))
      assert(in2.readLine() == "c 1 0")
      s2.close()
    } finally server.close()
  }

  test("a prolonged outage does not leak file descriptors across retries") {
    def openFds: Long =
      java.nio.file.Files.list(java.nio.file.Paths.get("/proc/self/fd")).count()
    val t = new ReconnectingCarbonTransport("127.0.0.1:1", connectTimeoutMs = 100)
    assert(!t.healthy) // warm the failure path (lazy classloading etc.)
    val before = openFds
    // each healthy() probe during an outage dials (and must close) a socket
    (1 to 50).foreach { _ => t.healthy; t.send("x 1 0\n") }
    val after = openFds
    assert(after <= before + 2, s"fd leak during outage: $before -> $after")
  }

  test("duplicate registration is rejected; removal frees the name") {
    val rep = new Reporter(new CarbonSink(_ => ()), 1000)
    val m   = Metric("x", "d")(() => 0L)
    assert(rep.addMetric(m, "a.x"))
    assert(!rep.addMetric(m, "a.x"))
    assert(rep.tryRemoveMetric("a.x"))
    assert(!rep.tryRemoveMetric("a.x"))
    assert(rep.addMetric(m, "a.x"))
  }
}
