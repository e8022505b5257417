package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming intake gate end-to-end over MemoryStream micro-batches:
  * per-row quality filtering, canonical-fingerprint dedup across
  * batches, and batch-mode parity of the same function.
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private case class Doc(doc_id: Long, text: String, ts: Long)

  private val good  = (1 to 30).map(i => f"word$i%03d").mkString(" ")
  private val degen = Seq.fill(30)("spam").mkString(" ")

  test("streaming intake gates quality and dedups across micro-batches") {
    val stream = MemoryStream[(Long, String, Long)](spark)
    val out = DocStream.intake(
      stream.toDF().toDF("doc_id", "text", "ts"), "ts", "60 seconds")
    val query = out.writeStream
      .format("memory").queryName("doc_intake").outputMode("append").start()
    try {
      stream.addData(
        (1L, good, 1000000L),
        (2L, degen, 1100000L),          // fails the repetition gate
        (3L, good + " ", 1200000L))     // same canonical fingerprint as 1
      query.processAllAvailable()
      stream.addData(
        (10L, "  " + good, 2000000L),   // redelivered content, new id
        (11L, (31 to 60).map(i => f"word$i%03d").mkString(" "), 2100000L))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM doc_intake")
        .collect().map(_.getLong(0)).toSet
      // one survivor per canonical text, degenerate doc gone
      assert(ids.intersect(Set(1L, 3L, 10L)).size == 1)
      assert(!ids.contains(2L))
      assert(ids.contains(11L))
    } finally query.stop()
  }

  test("the same intake runs in batch mode with identical gating") {
    val docs = Seq(
      (1L, good, 1000000L), (2L, degen, 1100000L), (3L, good + " ", 1200000L)
    ).toDF("doc_id", "text", "ts")
    val out = DocStream.intake(docs, "ts").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(Set(1L, 3L)) && out.size == 1)
  }

  test("intakeToIndex rejects duplicates arriving beyond the watermark horizon") {
    val table = "graft_stream_intake_idx"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = java.nio.file.Paths.get(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
      .resolve(table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val tmp = java.nio.file.Files.createTempDirectory("intake_idx").toString

    val stream = MemoryStream[(Long, String, Long)](spark)
    val query = DocStream.intakeToIndex(
      stream.toDF().toDF("doc_id", "text", "ts"), "ts",
      table, s"$tmp/out", s"$tmp/ckpt", watermarkDelay = "0 seconds")
    try {
      stream.addData((1L, good, 1000000L), (2L, degen, 1100000L))
      query.processAllAvailable()
      // hours later (stream-side dedup state long expired): a canonical
      // duplicate of doc 1 plus one novel doc — only the INDEX can
      // reject the former now
      stream.addData(
        (10L, good + "  ", 7200000000L),
        (11L, (31 to 60).map(i => f"word$i%03d").mkString(" "), 7200100000L))
      query.processAllAvailable()

      val admitted = spark.read.parquet(s"$tmp/out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == Set(1L, 11L))
      // the whole-history index holds exactly the two canonical prints
      assert(spark.table(table).count() == 2)
    } finally query.stop()
  }
}
