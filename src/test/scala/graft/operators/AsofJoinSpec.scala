package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("picks the latest right row at or before each left timestamp, per key") {
    val left = Seq(("a", 10L, "e1"), ("a", 25L, "e2"), ("b", 10L, "e3"))
      .toDF("k", "ts", "ev")
    val right = Seq(("a", 5L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0), ("b", 50L, 9.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select("ev", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("e1") == 2.0) // equal ts visible at its own timestamp
    assert(out("e2") == 3.0) // latest ≤ 25 is 20
    assert(out("e3") == null) // no right row at or before 10 for key b
  }

  test("left rows and extra columns survive unchanged") {
    val left  = Seq(("a", 10L, 42)).toDF("k", "ts", "payload")
    val right = Seq(("a", 1L, 7.0)).toDF("k", "ts", "v")
    val row = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v")).collect().head
    assert(row.getAs[Int]("payload") == 42)
    assert(row.getAs[Double]("v") == 7.0)
    assert(row.getAs[Long]("ts") == 10L)
  }
}
