package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.SparkSpec

/** Pins the hash parity `ngram_heavy_hitters_sketch` relies on: items a
  * SQL `count_min_sketch` aggregate inserted (UTF8String bytes) must be
  * found by driver-side `CountMinSketch.estimateCount(String)` — if the
  * two hashed differently, every estimate would read 0 and the
  * never-undercounts invariant would silently break.
  */
class CmsParitySpec extends SparkSpec {
  import spark.implicits._

  test("SQL-agg-built sketch answers Java-side string estimates exactly") {
    val words = Seq.fill(100)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val bytes = words.toDF("w")
      .agg(count_min_sketch(col("w"), lit(0.001), lit(0.99), lit(7)).as("c"))
      .head.getAs[Array[Byte]]("c")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    assert(cms.totalCount() == words.length)
    // CMS never undercounts; with 3 distinct items in a ~2718-wide
    // sketch there are no collisions, so the estimates are exact
    assert(cms.estimateCount("alpha") == 100L)
    assert(cms.estimateCount("beta") == 7L)
    assert(cms.estimateCount("gamma") == 1L)
    assert(cms.estimateCount("never-inserted") == 0L)
  }
}
