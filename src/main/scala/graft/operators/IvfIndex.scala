package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted bucketed IVF index — the 100 TB SERVING shape for ANN:
  * `embed_ivf_knn` recomputes centroids and re-scans the whole corpus on
  * every query run; here the assigned corpus is materialized ONCE,
  * bucketed (and sorted) by cell, and each probe run reads only the
  * probed cells' buckets (bucket pruning via a literal IN list) and joins
  * the broadcast query set with ZERO corpus-side Exchange — the scan IS
  * the index lookup. Asserted at the plan level in IvfIndexSpec.
  *
  * The probe-cell collect is O(#queries × nProbe) ids — serving metadata,
  * not data movement.
  */
object IvfIndex {

  import graft.functions.VectorExpressions.{dot_product, l2_norm}

  /** Per-cell centroids of a (vec_id, label, v) corpus: element-wise mean
    * as (c_label, cv, cn) — deterministic, shared with embed_centroids.
    */
  def labelCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("v")).as(Seq("pos", "e")))
      .groupBy("label", "pos")
      .agg(avg("e").as("c"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("c_label"), transform(col("pc"), _.getField("c")).as("cv"))
      .withColumn("cn", l2_norm(col("cv")))

  /** Build step (run once, amortized over every probe): persist the
    * corpus with cell = label, bucketed by cell so probes are
    * shuffle-free and pruned to the probed cells' files.
    *
    * Serving sessions should set
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`: the
    * planner's DisableUnnecessaryBucketedScan rule reasons only about
    * output partitioning and would silently forfeit bucket pruning under
    * a broadcast probe join (asserted in IvfIndexSpec).
    */
  def build(spark: SparkSession, corpus: DataFrame, table: String,
      buckets: Int): Unit =
    Bucketing.writeBucketed(
      corpus.select(col("vec_id"), col("v"), col("nrm"),
        col("label").as("cell")),
      table, "cell", buckets)

  /** Per-query probe cells by centroid cosine (ties → lowest cell), the
    * assignment rule of embed_ivf_knn's oracle: (query_id, qv, qn, cell).
    */
  def assignQueries(queries: DataFrame, cents: DataFrame,
      nProbe: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("c_label"))
    queries
      .crossJoin(broadcast(cents))
      .withColumn("ccos",
        round(dot_product(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("c_label").as("cell"))
  }

  /** Scored candidates from the persisted index: bucket-pruned scan of
    * the probed cells ⋈ broadcast queries — no Exchange on the corpus
    * side (the pre-rank frame is exposed so the plan property is
    * assertable without the rank window's small query-side shuffle).
    */
  def probeCandidates(spark: SparkSession, table: String,
      assigned: DataFrame): DataFrame = {
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    spark.table(table)
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .join(broadcast(assigned), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("cell").cast("int").as("cell"),
        col("vec_id").as("neighbor_id"),
        round(dot_product(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine"))
  }

  /** Full probe: candidates + BOUNDED per-query top-k on the rounded
    * cosine ([[graft.functions.TopKStructs]] — at most 2k candidates per
    * query survive the map side; a rank window would sort every probed
    * cell's full score list per query). Ties break (cosine desc,
    * neighbor_id asc), identical to the oracle's rank window.
    */
  def probe(spark: SparkSession, table: String, cents: DataFrame,
      queries: DataFrame, topK: Int, nProbe: Int): DataFrame = {
    import graft.functions.TopKStructs.top_k_structs
    probeCandidates(spark, table, assignQueries(queries, cents, nProbe))
      .groupBy("query_id")
      .agg(top_k_structs(
        struct((-col("cosine")).as("neg"), col("neighbor_id"),
          col("cell"), col("cosine")), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.cell").as("cell"),
        col("col.neighbor_id").as("neighbor_id"), col("col.cosine").as("cosine"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
