package graft.commands

import java.nio.file.{Files, Paths}
import java.util.UUID

import scala.collection.mutable

import graft.SparkSpec
import graft.commands.CommandProtocol._
import graft.sources.Fixtures.F144Msg

/** Multi-job, multi-worker pool choreography — the reference's
  * integration tier beyond one job's lifecycle
  * (`integration-tests/test_filewriter.py:262-340`,
  * `test_two_writers_write_three_files`): two workers share ONE job pool;
  * three jobs are requested, so the third queues until a worker frees;
  * pool discipline holds under a contended pl72 (a start arriving on a
  * writing worker's command channel is rejected with a failure answ, and
  * the shared pool is never polled while writing); back-to-back jobs
  * reuse one service. Both the command-topic transcripts (kinds, order,
  * per-worker control-topic switches) and the sink contents of all three
  * files are asserted.
  */
class PoolChoreographySpec extends SparkSpec {
  import spark.implicits._

  /** One Kafka-consumer-group job pool shared by all workers: a record is
    * delivered to exactly one idle poller (the reference runs all writers
    * in one consumer group on the pool topic, `JobListener.cpp:1-38`).
    */
  private final class SharedPool {
    val q = mutable.Queue.empty[Array[Byte]]
    def poll(): Option[Array[Byte]] =
      q.synchronized { if (q.isEmpty) None else Some(q.dequeue()) }
    def size: Int = q.synchronized(q.size)
  }

  private final class WorkerTransport(pool: SharedPool) extends CommandTransport {
    val commands      = mutable.Queue.empty[Array[Byte]]
    val out           = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    val topicSwitches = mutable.ArrayBuffer.empty[Option[String]]
    var committed     = 0
    override def useControlTopic(topic: Option[String]): Unit =
      topicSwitches += topic
    def pollJobPool(): Option[Array[Byte]] = pool.poll()
    def pollCommands(): Option[Array[Byte]] =
      if (commands.isEmpty) None else Some(commands.dequeue())
    def produce(kind: String, payload: Array[Byte]): Unit = out += ((kind, payload))
    def commitJobPool(): Unit = committed += 1
  }

  private val template =
    """{ "children": [ { "name": "entry", "type": "group", "children": [
      |  { "name": "speed", "type": "group", "children": [
      |    { "module": "f144", "config": { "source": "speed", "topic": "tp",
      |      "enable_epics_con_info": false, "enable_alarm_info": false } } ] }
      |] } ] }""".stripMargin

  test("two workers, three files: third job queues, frees into the first " +
    "finished worker; contended pl72 rejected; all sinks independent") {
    val outRoot = Files.createTempDirectory("graft-pool").toString
    val pool    = new SharedPool
    val trA     = new WorkerTransport(pool)
    val trB     = new WorkerTransport(pool)
    val mA      = new Master(spark, "writer-a", outRoot)
    val mB      = new Master(spark, "writer-b", outRoot)
    // long status interval: heartbeats out of the way of kind transcripts
    val loopA = new CommandLoop(mA, trA, statusIntervalMs = 1000000)
    val loopB = new CommandLoop(mB, trB, statusIntervalMs = 1000000)

    def enqueue(file: String, ctrl: String): String = {
      val id = UUID.randomUUID().toString
      // serviceId empty: a pool job is for WHOEVER polls it first
      pool.q += encodeRunStart(RunStart(10000, 15000, "run", "inst",
        template, id, "", file, ctrl))
      id
    }
    // one in-window value unique to the job, then a beyond-stop message
    // that finishes the single stream → the stop monitor emits wrdn
    def feed(m: Master, v: Double): Unit = {
      val job = m.currentJob.getOrElse(fail("worker not writing"))
      job.processBatch("f144", Seq(
        F144Msg("tp", "speed", 0, 10100, 10100000000L, v),
        F144Msg("tp", "speed", 1, 16000, 16000000000L, -1.0)).toDF())
    }
    def writingId(m: Master): String =
      m.currentState.asInstanceOf[m.Writing].jobId

    val id1 = enqueue("f1.nxs", "ctrl-1")
    val id2 = enqueue("f2.nxs", "ctrl-2")
    val id3 = enqueue("f3.nxs", "ctrl-3")
    assert(pool.size == 3)

    // both workers join: each picks EXACTLY one job; the third stays
    // queued (the first tick also emits the initial x5f2 heartbeat)
    assert(loopA.tick(1) == Seq("answ", "x5f2"))
    assert(loopB.tick(1) == Seq("answ", "x5f2"))
    assert(writingId(mA) == id1 && writingId(mB) == id2)
    assert(pool.size == 1, "third job must remain queued while both write")
    assert(trA.committed == 1 && trB.committed == 1)

    // pool discipline: further ticks of BUSY workers never touch the pool
    loopA.tick(2); loopB.tick(2)
    assert(pool.size == 1, "a writing worker polled the job pool")

    // contended pl72: a start arriving on a WRITING worker's command
    // channel is rejected with a failure answ naming the current job
    val contendedId = UUID.randomUUID().toString
    trA.commands += encodeRunStart(RunStart(10000, 15000, "run", "inst",
      template, contendedId, "writer-a", "f4.nxs", "ctrl-4"))
    assert(loopA.tick(3) == Seq("answ"))
    val rej = decodeAnswer(trA.out.last._2).toOption.get
    assert(!rej.success && rej.action == ActionType.StartJob)
    assert(rej.jobId == contendedId)
    assert(rej.message.contains(s"already writing job $id1"))
    assert(writingId(mA) == id1, "contended start must not displace the job")

    // worker A finishes job 1 → wrdn → REJOINS the pool and picks job 3
    feed(mA, 1.0)
    assert(loopA.tick(4).contains("wrdn"))
    assert(mA.currentJob.isEmpty)
    assert(loopA.tick(5) == Seq("answ"))
    assert(writingId(mA) == id3, "freed worker must pick up the queued job")
    assert(pool.size == 0)
    assert(trA.committed == 2)

    // finish the remaining two jobs
    feed(mB, 2.0)
    assert(loopB.tick(6).contains("wrdn"))
    feed(mA, 3.0)
    assert(loopA.tick(7).contains("wrdn"))
    assert(mA.currentJob.isEmpty && mB.currentJob.isEmpty)

    // command-topic transcript: every wrdn decodes, names its own service,
    // job and file — three distinct completions across the two workers
    val wrdns = (trA.out ++ trB.out).filter(_._1 == "wrdn")
      .map(o => decodeFinished(o._2).toOption.get)
    assert(wrdns.size == 3)
    assert(wrdns.map(_.jobId).toSet == Set(id1, id2, id3))
    assert(wrdns.map(_.fileName).toSet ==
      Set(s"$outRoot/f1.nxs", s"$outRoot/f2.nxs", s"$outRoot/f3.nxs"))
    assert(wrdns.forall(!_.error))
    assert(wrdns.filter(_.serviceId == "writer-a").map(_.jobId).toSet ==
      Set(id1, id3), "worker A wrote jobs 1 and 3 back-to-back")
    assert(wrdns.find(_.serviceId == "writer-b").map(_.jobId).contains(id2))

    // per-worker outbound kind order (heartbeats aside): accept, reject,
    // wrdn, accept, wrdn
    assert(trA.out.map(_._1).filter(_ != "x5f2").toSeq ==
      Seq("answ", "answ", "wrdn", "answ", "wrdn"))
    assert(trB.out.map(_._1).filter(_ != "x5f2").toSeq == Seq("answ", "wrdn"))

    // control-topic switching per run, reverting between runs
    assert(trA.topicSwitches.toSeq ==
      Seq(Some("ctrl-1"), None, Some("ctrl-3"), None))
    assert(trB.topicSwitches.toSeq == Seq(Some("ctrl-2"), None))

    // sink isolation: each file holds exactly its own job's value, and
    // the completion artifact (native .h5) exists per file
    Seq(("f1.nxs", 1.0), ("f2.nxs", 2.0), ("f3.nxs", 3.0)).foreach {
      case (f, v) =>
        val vals = spark.read.parquet(s"$outRoot/$f/data/entry/speed/data")
          .orderBy("row").collect().map(_.getAs[Double]("value")).toSeq
        assert(vals == Seq(v), s"$f sink contents")
        // a .nxs basename IS the artifact name (no extra .h5 suffix)
        assert(Files.exists(Paths.get(s"$outRoot/$f/$f")),
          s"$f completion HDF5 artifact missing")
    }
  }
}
