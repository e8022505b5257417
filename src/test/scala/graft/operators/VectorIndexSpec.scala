package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Graft

/** IVF index quality: trains the coarse quantizer on the real embeddings
  * table and measures recall@k against brute force — full-probe must be
  * exact, partial probe must beat a recall floor.
  */
class VectorIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K   = 8

  private lazy val vecs  = VectorIndex.vectors(Graft.embeddings(spark, dir))
  private lazy val cents = VectorIndex.trainCentroids(vecs, K, iters = 3)
  private lazy val corpus = VectorIndex.assign(vecs, cents).persist()
  private lazy val queries = vecs.filter(col("vec_id") < 10)

  private def bruteTop5: Map[Long, Set[Long]] = {
    val e = vecs.withColumn("nrm",
      sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
          (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
  }

  test("every vector lands in a valid cell; no cell empty after training") {
    val cells = corpus.groupBy("cell").count().collect()
    assert(cells.map(_.getInt(0)).toSet.subsetOf((0 until K).toSet))
    assert(corpus.filter(col("cell").isNull).count() == 0)
  }

  test("full probe (nProbe = K) reproduces brute-force top-5 exactly") {
    val ivf = VectorIndex.search(corpus, cents, queries, topK = 5, nProbe = K)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(ivf == bruteTop5)
  }

  test("partial probe (nProbe = 2) keeps recall@5 above 0.5") {
    val brute = bruteTop5
    val ivf = VectorIndex.search(corpus, cents, queries, topK = 5, nProbe = 2)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = brute.map { case (q, truth) =>
      ivf.get(q).map(found => found.intersect(truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.5, s"mean recall@5 was $mean")
  }

  test("equidistant centroids probe two DISTINCT cells") {
    import spark.implicits._
    // two identical centroids: any query is equidistant to cells 0 and 1;
    // cell 2 is far away. nProbe=2 must cover BOTH near cells, so the
    // corpus point planted in cell 1 is reachable.
    val dupCents = Seq(Seq(0.0, 0.0), Seq(0.0, 0.0), Seq(100.0, 100.0))
    val corpus2 = Seq(
      (100L, Seq(0.1, 0.0), 0), // in cell 0
      (101L, Seq(0.0, 0.1), 1), // planted in cell 1 (ties broken manually)
      (102L, Seq(99.0, 99.0), 2)
    ).toDF("vec_id", "v", "cell")
    val q = Seq((1L, Seq(0.05, 0.05))).toDF("vec_id", "v")
    val hits = VectorIndex
      .search(corpus2, dupCents, q, topK = 3, nProbe = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(hits == Set(100L, 101L),
      s"expected both equidistant cells probed, got $hits")
  }
}
