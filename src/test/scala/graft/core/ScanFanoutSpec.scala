package graft.core

import java.nio.file.Files

import graft.SparkSpec

/** Scan-fanout policy (r14 optimization): a table whose file layout plans
  * far fewer scan tasks than the session has cores is round-robin fanned
  * out to cores/divisor partitions; tiny tables and the `off` conf leave
  * the plan untouched; results are row-identical either way.
  */
class ScanFanoutSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("fanout").toString
    import spark.implicits._
    // ~200 KB compressed: one file, one row group — the under-parallelized
    // shape — comfortably above the 16 KiB/task funding floor
    (1 to 20000).map(i => (i.toLong, s"row $i " + ("x" * 64)))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    // sub-floor tiny table: fanout must not fire
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/tiny.parquet")
    d
  }

  private def scanPartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("under-parallelized scan fans out to cores/divisor") {
    spark.conf.unset(Graft.FanoutConfKey)
    val df = Graft.table(spark, dir, "documents")
    // local[4] / divisor 4 → cap max(2, 1) = 2
    assert(scanPartitions(df) == 2)
    assert(df.queryExecution.optimizedPlan.toString.contains("Repartition"))
  }

  test("fanout off leaves the single-split scan alone") {
    spark.conf.set(Graft.FanoutConfKey, "off")
    try {
      val df = Graft.table(spark, dir, "documents")
      assert(scanPartitions(df) == 1)
      assert(!df.queryExecution.optimizedPlan.toString.contains("Repartition"))
    } finally spark.conf.unset(Graft.FanoutConfKey)
  }

  test("explicit width is honored and bounded by the funding floor") {
    spark.conf.set(Graft.FanoutConfKey, "3")
    try {
      assert(scanPartitions(Graft.table(spark, dir, "documents")) == 3)
      // 2-row table is far below minBytesPerTask — no fanout
      assert(scanPartitions(Graft.table(spark, dir, "tiny")) == 1)
    } finally spark.conf.unset(Graft.FanoutConfKey)
  }

  test("fanned and un-fanned reads hold identical rows") {
    spark.conf.unset(Graft.FanoutConfKey)
    val fanned = Graft.table(spark, dir, "documents")
    spark.conf.set(Graft.FanoutConfKey, "off")
    try {
      val plain = Graft.table(spark, dir, "documents")
      assert(fanned.exceptAll(plain).isEmpty && plain.exceptAll(fanned).isEmpty)
    } finally spark.conf.unset(Graft.FanoutConfKey)
  }

  test("filters still push to the parquet scan below the fanout exchange") {
    spark.conf.unset(Graft.FanoutConfKey)
    val df = Graft.table(spark, dir, "documents").filter("doc_id > 10")
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("GreaterThan(doc_id,10)"), s"no pushdown in: $scanLine")
  }
}
