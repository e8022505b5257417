package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join equals the naive inequality join") {
    val points = (0L until 200L by 3L).map(t => (t, s"p$t")).toDF("t", "pid")
    val intervals = Seq(
      (1L, 0L, 10L), (2L, 5L, 6L), (3L, 50L, 160L), (4L, 199L, 400L), (5L, 300L, 310L)
    ).toDF("iid", "lo", "hi")
    val banded = RangeJoin
      .bandedRangeJoin(points, intervals, "t", "lo", "hi", bandWidth = 16L)
      .select("pid", "iid").collect().map(_.toSeq).toSet
    val naive = points
      .join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      .select("pid", "iid").collect().map(_.toSeq).toSet
    assert(banded == naive)
    assert(naive.nonEmpty)
  }

  test("bounds are inclusive on both ends") {
    val points    = Seq((10L, "a"), (20L, "b")).toDF("t", "pid")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.bandedRangeJoin(points, intervals, "t", "lo", "hi", 7L)
      .select("pid").collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b"))
  }
}
