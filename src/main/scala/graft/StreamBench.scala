package graft

import org.apache.spark.sql.SparkSession

import graft.plans.NexusPlan
import graft.streaming.StreamingJob

/** Sink-path throughput probe: pushes synthetic f144 + ev44 micro-batches
  * through `StreamingJob.processBatch` (the full route → dedup → window →
  * module transform → distributed renumber → parquet append pipeline) and
  * prints one JSON line with msg/s. Use to track the streaming write path
  * across rounds the way `Bench` tracks queries.
  */
object StreamBench {

  private val template =
    """{ "children": [
      |  { "name": "entry", "type": "group", "children": [
      |    { "name": "speed", "type": "group", "children": [
      |      { "module": "f144",
      |        "config": { "source": "speed", "topic": "tp",
      |                    "enable_epics_con_info": false,
      |                    "enable_alarm_info": false } } ] },
      |    { "name": "events", "type": "group", "children": [
      |      { "module": "ev44",
      |        "config": { "source": "det", "topic": "tp",
      |                    "cue_interval": 1000000 } } ] }
      |  ] } ] }""".stripMargin

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val msgs = sys.env.getOrElse("SPARK_GRAFT_STREAM_MSGS", "100000").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("graft-sbench").toString
    // window wide enough that every message lands
    val job = new StreamingJob(spark, NexusPlan.parse(template), out,
      startMs = 0, stopMs = 1L << 40)

    val perBatch = msgs / batches
    val t0 = System.nanoTime()
    var off = 0L
    (0 until batches).foreach { b =>
      val f144 = (0 until perBatch).map { i =>
        val o = off + i
        graft.sources.Fixtures.F144Msg("tp", "speed", o, 1000 + o,
          (1000 + o) * 1000000L, (o % 97).toDouble)
      }
      job.processBatch("f144", f144.toDF())
      val ev44 = (0 until perBatch / 10).map { i =>
        val o = off + i
        graft.sources.Fixtures.Ev44Msg("tp", "det", o, 1000 + o,
          (1000 + o) * 1000000L, Seq((1000 + o) * 1000000L), Seq(0),
          Seq.tabulate(10)(j => j + i), Seq.tabulate(10)(j => j + i + 1))
      }
      job.processBatch("ev44", ev44.toDF())
      off += perBatch
    }
    job.finish()
    val sec = (System.nanoTime() - t0) / 1e9
    val total = msgs + msgs / 10 // ev44 messages carry 10 events each
    println(f"""{"metric":"stream_msg_per_sec","value":${total / sec}%.1f,"unit":"msg/s","messages":$total,"batches":$batches,"sec":$sec%.2f}""")
    spark.stop()
  }
}
