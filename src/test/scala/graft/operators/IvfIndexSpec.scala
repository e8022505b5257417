package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Graft
import graft.functions.VectorExpressions.l2_norm

/** Persisted bucketed IVF: the probe must be an index LOOKUP at the plan
  * level — bucket-pruned scan, no corpus-side Exchange — and produce the
  * same answer as the unbucketed IVF query.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir   = "/root/testdata/sf0.001"
  private val Table = "ivf_idx_spec"

  private def corpus = Graft.embeddings(spark, dir)
    .select(col("vec_id"), col("label"),
      transform(col("embedding"), _.cast("double")).as("v"))
    .withColumn("nrm", l2_norm(col("v")))

  test("probe is shuffle-free on the corpus side and bucket-pruned") {
    // the planner's DisableUnnecessaryBucketedScan rule judges bucketed
    // scans by output partitioning only — it would forfeit bucket PRUNING
    // here because the probe join is broadcast; serving sessions disable it
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      IvfIndex.build(spark, corpus, Table, buckets = 8)
      val cents = IvfIndex.labelCentroids(corpus)
      val q = corpus.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val cand = IvfIndex.probeCandidates(spark, Table,
        IvfIndex.assignQueries(q, cents, nProbe = 1).localCheckpoint(true))
      val plan = cand.queryExecution.executedPlan.toString
      assert(Bucketing.isShuffleFree(cand), s"probe plan shuffled:\n$plan")
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
        .getOrElse(fail(s"no bucket pruning in plan:\n$plan"))
      assert(sel.group(1).toInt < sel.group(2).toInt,
        s"scan read every bucket: ${sel.matched}")
      assert(cand.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql(s"DROP TABLE IF EXISTS $Table")
    }
  }

  test("bucketed probe answers match the unbucketed IVF query") {
    try {
      val bucketed = graft.queries.EmbedQueries
        .queries("embed_ivf_knn_bucketed")(spark, dir).collect()
      val plain = graft.queries.EmbedQueries
        .queries("embed_ivf_knn")(spark, dir).collect()
      assert(bucketed.map(_.toSeq).toSet == plain.map(_.toSeq).toSet)
      assert(bucketed.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ivf_index")
  }
}
