package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton z-values against a bit-twiddling model, and the layout claim
  * itself: z-ordered partitions bound BOTH dimensions' spans, where a
  * single-column sort leaves the other dimension unclustered.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def model(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (for {
      b <- 0 until bits
      (v, i) <- vals.zipWithIndex
    } yield ((v >> b) & 1L) << (b * n + (n - 1 - i))).sum
  }

  test("zvalue matches the interleaving model on random inputs") {
    val rnd  = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(Seq(col("x"), col("y")), 16).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == model(Seq(x, y), 16), s"($x, $y)")
    }
    // three dims too
    val got3 = Seq((5L, 9L, 3L)).toDF("a", "b", "c")
      .select(ZOrder.zvalue(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .head().getLong(0)
    assert(got3 == model(Seq(5L, 9L, 3L), 4))
  }

  test("z-layout bounds both dimensions per partition; x-sort does not") {
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")

    def avgBoxArea(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(avg("area")).head().getDouble(0)

    val zOrdered = ZOrder.layout(grid, Seq("x", "y"), 6, 16)
    val xOrdered = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")

    val zArea = avgBoxArea(zOrdered)
    val xArea = avgBoxArea(xOrdered)
    // 16 partitions of a 64×64 grid: z-order boxes ≈ 16×16 = 256;
    // x-sort slabs are 4×64 = 256 by area but unbounded in y — compare
    // the MAX single-dimension span instead for the sharper claim
    val zMaxY = zOrdered.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max("y") - min("y")).as("s"))
      .agg(max("s")).head().getLong(0)
    val xMaxY = xOrdered.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max("y") - min("y")).as("s"))
      .agg(max("s")).head().getLong(0)
    assert(xMaxY == 63L)       // x-sort: every partition spans all of y
    assert(zMaxY <= 31L)       // z-order: y is bounded inside each partition
    assert(zArea <= xArea * 1.5) // and the bounding boxes stay comparable
  }

  test("writeAnalytic round-trips with the layout key dropped") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("zorder_out").toString
    graft.pipelines.TrainingDataPipeline.writeAnalytic(grid, out, Seq("x", "y"), bits = 5, numFiles = 8)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("x", "y")) // zval is layout-only
    assert(back.count() == 32L * 32)
  }
}
