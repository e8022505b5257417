package graft

/** Driver-contract consistency: the correctness gate silently skips any
  * oracle whose key doesn't match a query (and records only a weak
  * rows-only check for queries without oracles), so key drift loses
  * coverage without failing anything. This spec makes drift loud.
  */
class ContractSpec extends SparkSpec {

  test("no orphan oracle entries: every oracleSql key names a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("spec-only queries are exactly the documented non-SQL-expressible set") {
    val specOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set("embed_pca_topk", "embed_pca_project",
      "embed_whiten_check", "embed_opq_knn", "embed_opq_recall")
    assert(specOnly == documented,
      s"undocumented spec-only queries: ${specOnly -- documented}; " +
        s"stale documentation: ${documented -- specOnly}")
  }

  test("oracle SQL texts are non-empty, NUL-free") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      assert(!sql.contains('\u0000'), s"$k: NUL in oracle SQL")
    }
  }

  test("the flagship entry returns rows on the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
