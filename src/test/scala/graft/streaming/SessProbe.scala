package graft.streaming

// scratch probe: sessionizer throughput vs shuffle-partition count
object SessProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", args.headOption.getOrElse("32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulSessions
    import spark.implicits._
    val n = 200000; val users = 5000; val batches = 10
    val stream = MemoryStream[StatefulSessions.SessionEvent](spark)
    val q = StatefulSessions.sessions(stream.toDS(), gapMs = 10000)
      .writeStream.format("memory").queryName("p").outputMode("append").start()
    var ts = 0L; val per = n / batches
    val t0 = System.nanoTime()
    (0 until batches).foreach { b =>
      stream.addData((0 until per).map(i => StatefulSessions.SessionEvent((i % users).toLong, ts + (i / users) * 3000L)))
      ts += 30000L; q.processAllAvailable()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE partitions=${args.headOption.getOrElse("32")} msgps=${n / sec}%.1f sec=$sec%.2f closed=${spark.table("p").count()}")
    q.stop(); spark.stop()
  }
}
