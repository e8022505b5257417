package graft.queries

import graft.SparkSpec

/** Label-vs-nearest-centroid confusion: a planted two-cluster fixture
  * with one mislabeled vector must put exactly that vector off-diagonal.
  */
class LabelConfusionSpec extends SparkSpec {
  import spark.implicits._

  test("embed_label_confusion: the planted mislabel is the only off-diagonal mass") {
    def axis(dim: Int, scale: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == dim) scale else 0.0f)
    val rows = Seq(
      (0L, axis(0, 2.0f), 0), (1L, axis(0, 3.0f), 0), // true label-0 cluster
      (2L, axis(1, 1.0f), 1), (3L, axis(1, 2.0f), 1), // true label-1 cluster
      (4L, axis(1, 4.0f), 0)                          // mislabeled: sits in cluster 1
    )
    val tmp = java.nio.file.Files.createTempDirectory("confusion").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = graft.SparkEntry.queries("embed_label_confusion")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out((0, 0)) == ((2L, 0.666667)))
    assert(out((0, 1)) == ((1L, 0.333333))) // the planted mislabel
    assert(out((1, 1)) == ((2L, 1.0)))
    assert(out.size == 3)
  }
}
