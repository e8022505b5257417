package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TopKStructs.top_k_structs

/** The bounded top-k aggregate against a full-sort model: random groups
  * and values (collision-heavy so compaction and merge paths both run),
  * serialization round-trips across the shuffle (partial → final), and
  * ties broken by the struct's later fields.
  */
class TopKStructsSpec extends SparkSpec {
  import spark.implicits._

  test("matches sortBy-take model on random grouped data") {
    val rnd  = new scala.util.Random(11)
    val rows = Seq.fill(5000)((rnd.nextInt(20).toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000)))
    for (k <- Seq(1, 3, 7)) {
      val got = rows.toDF("g", "v", "tag")
        .repartition(4) // force partial/merge across partitions
        .groupBy("g")
        .agg(top_k_structs(struct(col("v"), col("tag")), k).as("top"))
        .select(col("g"), col("top"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getInt(1))))
        .toMap
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted.take(k)
      }
      expected.foreach { case (g, exp) =>
        assert(got(g) == exp, s"group $g k=$k")
      }
    }
  }

  test("null child values are skipped; fewer than k rows yield all of them") {
    val out = Seq((1L, Some(5L)), (1L, None), (1L, Some(2L)))
      .toDF("g", "v")
      .groupBy("g")
      .agg(top_k_structs(when(col("v").isNotNull, struct(col("v"))), 10).as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.v"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 5L))
  }
}
