package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ArrayMinAgg.array_min_agg

/** Declarative element-wise array minimum: model cross-check across
  * forced partial/merge partitions, null-array handling, and the
  * MinHash union property it exists for (min of signatures = signature
  * of the set union).
  */
class ArrayMinAggSpec extends SparkSpec {
  import spark.implicits._

  test("matches the element-wise model across partitions") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(400)((rnd.nextInt(8).toLong,
      Seq.fill(16)(rnd.nextInt(1000000).toLong)))
    val got = rows.toDF("g", "a")
      .repartition(4)
      .groupBy("g").agg(array_min_agg(col("a")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val exp = rs.map(_._2).reduce((x, y) => x.zip(y).map(t => t._1 min t._2))
      assert(got(g) == exp, s"group $g")
    }
  }

  test("null arrays are ignored; all-null groups return null") {
    val df = Seq(
      (1L, Option(Seq(3L, 9L))), (1L, None), (1L, Option(Seq(5L, 2L))),
      (2L, Option.empty[Seq[Long]])
    ).toDF("g", "a")
    val out = df.groupBy("g").agg(array_min_agg(col("a")).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).toSeq)).toMap
    assert(out(1L) == Seq(3L, 2L))
    assert(out(2L) == null)
  }

  test("min of MinHash signatures equals the union's signature") {
    import graft.functions.MinHashSigs.minhash_sigs
    val a     = (1 to 30).map(i => s"tok$i")
    val b     = (20 to 50).map(i => s"tok$i")
    val union = (a ++ b).distinct
    val perSet = Seq(("g", a.toArray), ("g", b.toArray)).toDF("g", "sh")
      .groupBy("g")
      .agg(array_min_agg(minhash_sigs(col("sh"), 16)).as("m"))
      .head().getSeq[Long](1).toSeq
    val direct = Seq(Tuple1(union.toArray)).toDF("sh")
      .select(minhash_sigs(col("sh"), 16).as("m"))
      .head().getSeq[Long](0).toSeq
    assert(perSet == direct)
  }
}
