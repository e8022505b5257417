package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints the formatted physical plan for selected
  * contract queries so scan pushdown (`PushedFilters`), pruned schemas
  * (`ReadSchema`), broadcast joins, and whole-stage-codegen spans can be
  * eyeballed per round. Not part of the driver contract — a builder tool.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("f1_route_source", "q6_forecast_revenue", "dedup_exact",
        "sample_stratified", "dedup_minhash_lsh", "q3_shipping_priority",
        "dedup_substring_spans", "embed_rp_lsh_neardup",
        "text_lm_score", "text_winnow_fingerprint", "embed_sq8_knn",
        "sample_upsample", "shard_plan", "semdedup_drop",
        // round-6 additions with non-trivial plans
        "dedup_containment", "winnow_matches", "dedup_dup_ngram_fraction",
        "vocab_coverage_sweep", "embed_ivf_recall_curve", "split_ngram_leakage",
        // corpus-health family (embed_covariance/pca excluded: they run
        // eagerly during construction, so explain() would print only the
        // driver-local result table — nothing to audit, full pass paid)
        "boilerplate_per_source", "token_zipf_fit", "ngram_novelty",
        "dedup_chunk_exact")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
