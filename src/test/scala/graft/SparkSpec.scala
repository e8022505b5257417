package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs: small core count, shuffle partitions
  * sized to cores (matching the engine's own session policy).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  // routed through Service.withClusterHygiene so the test context carries
  // the deployment defaults and ServiceHygieneSpec can assert them on a
  // real session (the cleaner conf is context-level, the plan-string
  // bound is a static SQL conf — both only apply at context creation)
  lazy val spark: SparkSession = Service.withClusterHygiene(SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
    .getOrCreate()

  override def afterAll(): Unit = {
    // session is shared across suites in one forked JVM; don't stop it here
    super.afterAll()
  }
}
