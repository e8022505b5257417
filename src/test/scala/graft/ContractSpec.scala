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

  test("every query has an oracle: no spec-only rows remain") {
    // the former non-SQL-expressible set (PCA/OPQ) now ships invariant
    // certificates the oracle recomputes as constants — zero grey rows
    val specOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(specOnly.isEmpty, s"queries without oracles: $specOnly")
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

  test("audit-only names resolve: a typo would silently un-bucket a query") {
    val phantom = SparkEntry.auditOnlyQueries -- SparkEntry.queries.keySet
    assert(phantom.isEmpty, s"audit names without queries: $phantom")
    // audit queries stay correctness-gated: each must keep its oracle
    val unoracled = SparkEntry.auditOnlyQueries -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"audit queries without oracles: $unoracled")
  }
}
