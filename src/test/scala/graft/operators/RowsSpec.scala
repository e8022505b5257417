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
    val df = (0 until 2000).map(i => ((i * 7919) % 10007, i)).toDF("k", "payload")
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
