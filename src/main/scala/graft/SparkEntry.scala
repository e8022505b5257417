package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("w1_f144_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StreamQueries.queries ++ DocQueries.queries ++ EmbedQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    StreamQueries.sql ++ DocQueries.sql ++ EmbedQueries.sql ++ AnalyticsQueries.sql

  /** Queries that exist to AUDIT a production operator at sample scale
    * and are deliberately non-scalable by design (embed_rp_lsh_recall
    * compares LSH recall against the quadratic brute-force truth set —
    * something you certify on a sample, never run on the corpus). Still
    * correctness-gated like every other query, but Bench buckets them
    * separately (`audit_total_sec`) so the timed suite total stays a
    * scaling-meaningful number, and scale (sf ≥ 1) runs skip them via
    * SPARK_GRAFT_BENCH_SKIP_AUDIT=1.
    */
  def auditOnlyQueries: Set[String] = Set("embed_rp_lsh_recall")
}
