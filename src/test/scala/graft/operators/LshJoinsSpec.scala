package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.types.ArrayType

import graft.SparkSpec
import graft.queries.{DocQueries, EmbedQueries}

/** The hot-bucket guarantees of [[LshJoins.cappedBandPairs]]: exact
  * all-pairs semantics below the cap, linear star degradation (with
  * observed metrics, never silent) above it, and a band shuffle that
  * carries no array payloads — the three properties that keep the banded
  * dedup family from going quadratic on one degenerate bucket at corpus
  * scale.
  */
class LshJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("small buckets emit all pairs; hot buckets degrade to star pairs") {
    // bucket A: 10 members (hot at cap 4); bucket B: 3 members (exact)
    val banded = ((1L to 10L).map(i => ("A", i)) ++ Seq(("B", 20L), ("B", 21L), ("B", 22L)))
      .toDF("bkey", "id")
    val pairs = LshJoins.cappedBandPairs(banded, Seq("bkey"), "id",
      "id_a", "id_b", maxBucket = 4, tag = "spec_cap")
    val rows = pairs.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val aPairs = rows.filter(_._1 == "A")
    val bPairs = rows.filter(_._1 == "B")
    // star: every non-anchor member paired with the min id, O(B) not B²
    assert(aPairs.toSet == (2L to 10L).map(i => ("A", 1L, i)).toSet)
    assert(bPairs.toSet == Set(("B", 20L, 21L), ("B", 20L, 22L), ("B", 21L, 22L)))
    val m = pairs.queryExecution.observedMetrics("spec_cap")
    assert(m.getAs[Long]("hot_buckets") == 1L)
    assert(m.getAs[Long]("hot_members") == 10L)
    assert(m.getAs[Long]("largest_bucket") == 10L)
  }

  test("below the cap the result is exactly the uncapped all-pairs join") {
    val banded = (1L to 40L).map(i => (s"k${i % 5}", i)).toDF("bkey", "id")
    val capped = LshJoins.cappedBandPairs(banded, Seq("bkey"), "id",
      "id_a", "id_b", maxBucket = 4096, tag = "spec_exact")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = banded.as("x").join(banded.as("y"), Seq("bkey"))
      .filter($"x.id" < $"y.id")
      .select($"x.id", $"y.id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == brute)
  }

  test("adversarial corpus: one degenerate band stays linear end-to-end") {
    // 60 identical documents share every shingle, hence every band key:
    // uncapped LSH would verify C(60,2)=1770 pairs; capped at 8 the four
    // hot band buckets all emit the same 59 star pairs.
    val clone = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = ((1L to 60L).map(i => (i, clone)) :+
      (100L, "totally different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val pairs = DocQueries.minhashLshPairs(docs, maxBucket = 8)
    val got = pairs.collect()
    assert(got.length == 59, s"expected 59 star pairs, got ${got.length}")
    assert(got.forall(_.getLong(0) == 1L)) // all anchored at the min doc_id
    assert(got.forall(_.getDouble(2) == 1.0)) // clones verify at jac 1.0
    val m = pairs.queryExecution.observedMetrics("minhash_lsh_cap")
    assert(m.getAs[Long]("hot_buckets") == 4L) // one per band
    assert(m.getAs[Long]("largest_bucket") == 60L)
    // connectivity survives the cap: the clone cluster is ONE component
    val labels = ConnectedComponents.labels(pairs.select("doc_a", "doc_b"))._1
    assert(labels.select("label").distinct().count() == 1)
    assert(labels.count() == 60)
  }

  test("TEXT band-join shuffles carry no array column (slim-key contract)") {
    // text LSH keeps the slim contract: shingle/signature payloads are
    // large relative to candidate counts, so they re-attach per candidate
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (1L to 30L).map(i => (i, s"token$i alpha beta gamma delta"))
        .toDF("doc_id", "text")
      val df = DocQueries.minhashLshPairs(docs)
      val bandKeys = Set("bkey", "bits", "blk", "band", "rot")
      val offenders = df.queryExecution.executedPlan.collect {
        case ex: ShuffleExchangeExec => ex
      }.filter { ex =>
        ex.outputPartitioning match {
          case h: HashPartitioning =>
            h.expressions.flatMap(_.references.toSeq).exists(a => bandKeys(a.name))
          case _ => false
        }
      }.filter(_.output.exists(_.dataType.isInstanceOf[ArrayType]))
      assert(offenders.isEmpty,
        s"band shuffle ships an array column:\n${offenders.mkString("\n")}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("EMBEDDING pair-frame exchanges carry no array column (payload-through-band contract)") {
    // the embedding family inverts the contract (measured, sf10 probe):
    // candidates outnumber corpus rows ~50:1, so the 0.5 KB vector rides
    // the band shuffle ONCE (corpus × bands — linear) and cosine is
    // verified inside the bucket join's output stream. What must never
    // happen is the reverse: an exchange keyed by pair ids (vec_a/vec_b —
    // the dedup or re-attach shape) shipping array columns — that is the
    // candidates × 0.5 KB sort that filled the disk at sf10.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = (1L to 30L).map(i => (i, i % 3, Array.fill(8)(i.toFloat)))
        .toDF("vec_id", "label", "embedding")
      val df = EmbedQueries.rpLshPairs(
        e.select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
         .withColumn("nrm", graft.functions.VectorExpressions.l2_norm(col("v"))))
      val exchanges = df.queryExecution.executedPlan.collect {
        case ex: ShuffleExchangeExec => ex
      }
      val pairKeyed = exchanges.filter { ex =>
        ex.outputPartitioning match {
          case h: HashPartitioning =>
            h.expressions.flatMap(_.references.toSeq)
              .exists(a => a.name == "vec_a" || a.name == "vec_b")
          case _ => false
        }
      }
      val offenders = pairKeyed.filter(_.output.exists(_.dataType.isInstanceOf[ArrayType]))
      assert(offenders.isEmpty,
        s"pair-keyed exchange ships an array column:\n${offenders.mkString("\n")}")
      // and the band shuffle does carry the payload — the linear leg exists
      val bandKeyed = exchanges.filter { ex =>
        ex.outputPartitioning match {
          case h: HashPartitioning =>
            h.expressions.flatMap(_.references.toSeq).exists(a => a.name == "bits")
          case _ => false
        }
      }
      assert(bandKeyed.exists(_.output.exists(_.dataType.isInstanceOf[ArrayType])),
        "expected the band shuffle to carry the vector payload (linear leg)")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
