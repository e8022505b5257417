package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) vector index: k-means coarse quantizer + cell-pruned
  * search — the standard recall/latency trade for ANN at 100 TB, where the
  * brute-force corpus pass stops being affordable.
  *
  * Distributed shape: every iteration keeps the corpus distributed and only
  * the k×d centroid matrix (a few KB) moves — collected to the driver and
  * re-broadcast as a literal array, so assignment is a single codegen'd
  * projection with no join and no shuffle; the only shuffle is the
  * per-cell mean (k groups).
  */
object VectorIndex {

  import graft.functions.VectorExpressions.{centroid_dists, dot_product, l2_norm, nearest_centroid}

  /** Squared-L2 distances from a vector column to every centroid — one
    * native expression over the literal k×d matrix (earlier rounds
    * measured both alternatives and both lose: k unrolled fold
    * expressions cost seconds of codegen compile; a `transform` lambda
    * halves compile but doubles RUN time because higher-order functions
    * evaluate interpreted — the native loop wins on both axes).
    */
  private def dist2All(v: Column, cents: Seq[Seq[Double]]): Column =
    centroid_dists(v, cents)

  /** Nearest-cell id against literal centroids (ties → lowest cell). */
  private def nearestCell(v: Column, cents: Seq[Seq[Double]]): Column =
    nearest_centroid(v, cents)

  /** Widened embedding view: (vec_id, v: array<double>). */
  def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  /** Lloyd's k-means with deterministic init (the k lowest-id vectors).
    * Returns the centroid matrix; `iters` small because the quantizer only
    * needs rough cells, not convergence.
    */
  def trainCentroids(vecs: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    // the iteration loop re-reads the corpus `iters`+1 times — cache it
    val cached = vecs.persist()
    try trainOn(cached, k, iters)
    finally cached.unpersist()
  }

  private def trainOn(vecs: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    var cents: Seq[Seq[Double]] = vecs
      .orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("cell", nearestCell(col("v"), cents))
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "e")))
        .groupBy("cell", "pos")
        .agg(avg("e").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), _.getField("m")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
        .toMap
      // empty cells keep their previous centroid
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** Corpus assignment: one projection, no shuffle. */
  def assign(vecs: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    vecs.withColumn("cell", nearestCell(col("v"), cents))

  /** Multi-probe IVF top-k: each query searches its `nProbe` nearest cells
    * only. The corpus side shuffles once on cell (or is pre-partitioned /
    * bucketed by cell in a persisted index); queries broadcast.
    */
  def search(
      corpus: DataFrame, // assign() output
      cents: Seq[Seq[Double]],
      queries: DataFrame, // vectors() subset
      topK: Int,
      nProbe: Int
  ): DataFrame = {
    val qd = queries
      .withColumn("qn", l2_norm(col("v")))
      .withColumn("dists", dist2All(col("v"), cents))
      // index-carrying structs: two equidistant centroids keep distinct
      // cell ids (a value lookup via array_position would resolve both
      // to the first match and silently probe one cell twice)
      .withColumn("probes",
        slice(array_sort(
          transform(col("dists"),
            (d: Column, i: Column) => struct(d.as("d"), i.cast("int").as("cell")))),
          1, nProbe))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("qn"),
        explode(transform(col("probes"), _.getField("cell"))).as("cell"))
    val cd = corpus.withColumn("nrm", l2_norm(col("v")))
    val scored = cd
      .join(broadcast(qd), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot_product(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }
}
