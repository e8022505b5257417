package graft.operators

import graft.SparkSpec

/** The distributed row-numbering primitive everything in the sink path
  * rests on: consecutive ids in order, in-place renumbering, the weighted
  * exclusive prefix sum, start offsets, and empty frames — across enough
  * rows to span many range partitions.
  */
class RowsSpec extends SparkSpec {
  import spark.implicits._

  test("consecutive ids follow the order column across partitions") {
    // shuffled input, 10k rows > shuffle partitions so ranges matter
    val df  = (0 until 10000).map(i => ((i * 7919) % 10007, i)).toDF("k", "payload")
    val out = Rows.indexed(df, "k").orderBy("row").collect()
    assert(out.length == 10000)
    assert(out.map(_.getAs[Long]("row")).toSeq == (0L until 10000L))
    // row order must equal k order
    val ks = out.map(_.getAs[Int]("k"))
    assert(ks.sameElements(ks.sorted))
  }

  test("in-place renumbering of sparse keys with a start offset") {
    val df  = Seq(100L, 5L, 900L, 42L).toDF("row")
    val out = Rows.indexed(df, "row", start = 7L).orderBy("row").collect()
    assert(out.map(_.getAs[Long]("row")).toSeq == Seq(7L, 8L, 9L, 10L))
  }

  test("weighted exclusive prefix sum matches a sequential scan") {
    val df = (0 until 5000).map(i => (i.toLong, (i % 13).toLong)).toDF("k", "w")
    val out = Rows
      .indexed(df, "k", weight = Some(("w", "acc", 100L)))
      .orderBy("k").collect()
    var expect = 100L
    out.foreach { r =>
      assert(r.getAs[Long]("acc") == expect)
      expect += r.getAs[Long]("w")
    }
  }

  test("empty frames survive") {
    val df  = Seq.empty[(Long, Long)].toDF("k", "w")
    assert(Rows.indexed(df, "k").count() == 0)
    assert(Rows.indexed(df, "k", weight = Some(("w", "acc", 0L))).count() == 0)
  }

  test("small-hint path: same ids, single partition, exact count") {
    // repartition first: a raw toDF is a LocalRelation and would take the
    // driver fast path — this test pins the DISTRIBUTED small path
    val df = (0 until 2000).map(i => ((i * 7919) % 10007, i))
      .toDF("k", "payload").repartition(5)
    val (out, n) = Rows.indexedCounted(df, "k", start = 3L, sizeHint = 2000L)
    assert(n == 2000L)
    assert(out.rdd.getNumPartitions == 1)
    val rows = out.orderBy("row").collect()
    assert(rows.map(_.getAs[Long]("row")).toSeq == (3L until 2003L))
    val ks = rows.map(_.getAs[Int]("k"))
    assert(ks.sameElements(ks.sorted))
    // weighted small path: exclusive prefix sum starts at wStart with no
    // stats pass needed by the stamping
    val wdf = (0 until 100).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "w")
    val wout = Rows.indexed(wdf, "k", weight = Some(("w", "acc", 50L)),
      sizeHint = 100L).orderBy("k").collect()
    var expect = 50L
    wout.foreach { r =>
      assert(r.getAs[Long]("acc") == expect); expect += r.getAs[Long]("w")
    }
  }

  test("driver fast path: a LocalRelation numbers with zero jobs and STAYS local") {
    val df = Seq((30L, 2L), (10L, 5L), (20L, 3L)).toDF("k", "w")
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val (out, n) = Rows.indexedCounted(df, "k", start = 7L,
        weight = Some(("w", "acc", 100L)), sizeHint = 3L)
      // the RESULT plan is still a LocalRelation — downstream flat
      // transforms keep folding into driver-side appends
      assert(out.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      assert(n == 3L)
      val rows = out.collect() // LocalTableScan: still no job
      // listener delivery is async: wait until the count is stable
      var prev = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (jobs == prev) stable += 1 else { prev = jobs; stable = 0 }
      }
      assert(jobs == 0, s"driver numbering must launch no Spark job, saw $jobs")
      // same ids/weights the distributed path assigns, in k order
      assert(rows.map(r => (r.getAs[Long]("k"), r.getAs[Long]("row"),
        r.getAs[Long]("acc"))).toSeq ==
        Seq((10L, 7L, 100L), (20L, 8L, 105L), (30L, 9L, 108L)))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("byte hint vetoes the small path for wide rows and widens the exchange") {
    val df = (0 until 1000).map(i => (i, i)).toDF("k", "payload")
    // 1000 rows is under every row bound, but 1000 x 1 MB claimed bytes
    // must route to the parallel range path with >1 partition
    val wide = Rows.indexed(df, "k", sizeHint = 1000L, byteHint = 1000L << 20)
    assert(wide.rdd.getNumPartitions > 1)
    assert(wide.orderBy("row").collect().map(_.getAs[Long]("row")).toSeq ==
      (0L until 1000L))
    // and a KNOWN-small byte hint relaxes the row bound for narrow rows
    val narrow = Rows.indexed(
      (0 until 100000).map(i => (i, i)).toDF("k", "p"),
      "k", sizeHint = 100000L, byteHint = 100000L * 8)
    assert(narrow.rdd.getNumPartitions == 1)
  }
}
