package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-bucket-bounded candidate generation for banded LSH self-joins.
  *
  * Every LSH family here (MinHash bands, SimHash rotation blocks,
  * random-hyperplane bands, IVF cell pairs) finds candidates by
  * self-joining a banded frame on its bucket key. Correct — but a single
  * degenerate bucket of B members yields B² candidate pairs, and on
  * boilerplate-heavy web text whole clusters of near-identical documents
  * share every band key, so one hot bucket becomes a quadratic straggler
  * task. Production LSH bounds this; so do we:
  *
  *   - buckets with at most `maxBucket` members emit ALL within-bucket
  *     pairs (the exact LSH semantics — untouched at every test scale
  *     factor, so oracles stay exact);
  *   - buckets past the threshold degrade to STAR pairs: every member is
  *     paired with the bucket's minimum-id anchor only. O(B) pairs
  *     instead of O(B²), every member still reachable — the
  *     connected-components and drop-list consumers still see the whole
  *     cluster as one component via the anchor; only marginal
  *     member-to-member pairs (which the verify step must re-find through
  *     another band) are traded;
  *   - nothing is capped silently: the observed metrics `hot_buckets`,
  *     `hot_members` and `largest_bucket` (Dataset.observe — a zero-cost
  *     CollectMetrics node, readable via `queryExecution.observedMetrics`
  *     or a QueryExecutionListener) report exactly what degraded.
  *
  * The input frame must be SLIM — bucket key columns plus the id only.
  * Payloads (shingle sets, vectors, signatures) are re-attached by the
  * caller per verified candidate, so the band shuffle never carries an
  * array column on either side.
  */
object LshJoins {

  /** Default hot-bucket threshold. At 4096 a bucket only degrades when
    * ≥4097 rows share one band key — a cluster of thousands of
    * near-identical documents, exactly the case where all-pairs
    * verification is pointless and star connectivity suffices.
    */
  val DefaultMaxBucket = 4096

  /** Pin the band exchange at the session's static shuffle width so AQE
    * cannot coalesce it down (an explicit user numPartitions is exempt
    * from CoalesceShufflePartitions). The within-bucket pair generation +
    * verify downstream of this exchange is CPU-bound per ROW-PAIR
    * (quadratic in bucket size), so AQE's bytes-based coalescing — built
    * for shuffle-read-bound stages — can under-parallelize it: every
    * ≥1 MB partition looks "big enough" by bytes while carrying seconds
    * of pair-verify CPU. OPT-IN per call site (`pinned = true`), because
    * the r15 A/B showed it only pays when the bucket key is COARSE (few
    * buckets × big quadratic pairing — the IVF `label` cell joins:
    * embed_knn_graph 0.70×, embed_neardup_cosine 0.68×, semdedup_drop
    * 0.81× min-over-5); fine-grained band keys (minhash/simhash/winnow
    * bands) measured 1.1–1.4× SLOWER pinned — their exchanges were never
    * the bottleneck and the fixed 32-task width just adds scheduling.
    * At deployment scale the pinned width is exactly what the exchange
    * had before coalescing, sized per cluster by
    * spark.sql.shuffle.partitions — not a local constant.
    */
  private def pinWidth(banded: DataFrame, bucket: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val width = banded.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (width > 0) banded.repartition(width, bucket: _*) else banded
  }

  /** Width-pinned candidate dedup: `repartition(width, cols) +
    * dropDuplicates(cols)` in place of a bare `.distinct()`, so the
    * CPU-heavy verify joins DOWNSTREAM of the dedup run at the session's
    * static shuffle width instead of whatever AQE's byte-based coalescing
    * leaves (OptProbe on dedup_containment: the 173k-pair array_intersect
    * verify ran as ONE 919 ms-CPU task over a 1.6 MB coalesced exchange).
    * Semantically identical to distinct(). The partial-agg loss is nil
    * for banded candidates: duplicates of a pair come from DIFFERENT
    * bands, which never share a band-exchange partition, so map-side
    * dedup could not collapse them anyway. Width = the deployment's
    * spark.sql.shuffle.partitions, same argument as [[pinWidth]].
    */
  def pinnedPairDedup(df: DataFrame, cols: Seq[String]): DataFrame = {
    val width = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (width > 0) df.repartition(width, cols.map(col): _*).dropDuplicates(cols)
    else df.dropDuplicates(cols)
  }

  /** Candidate pairs `(bucketCols…, outA, outB)` with `outA < outB` from
    * a slim banded frame `(bucketCols…, idCol)`. One keyed shuffle on the
    * bucket key (the window and the self-join share it); hot buckets
    * degrade to star pairs as documented above. Callers dedup across
    * buckets (`.select(outA, outB).distinct()`) and re-attach payloads.
    *
    * `tag` names the observed metrics and must be unique within any one
    * query composing several capped joins.
    */
  def cappedBandPairs(
      banded: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      outA: String,
      outB: String,
      maxBucket: Int = DefaultMaxBucket,
      tag: String = "lsh_cap"): DataFrame = {
    val bucket = bucketCols.map(col)
    // both the size and the min-id anchor come from the SAME unordered
    // partition window — an ordered window here would sort every band
    // partition just to read off its minimum
    val wAll = Window.partitionBy(bucket: _*)
    val annotated = banded
      .withColumn("__bsz", count(lit(1)).over(wAll))
      .withColumn("__anchor", min(col(idCol)).over(wAll))
      .observe(
        tag,
        sum(when(col("__bsz") > maxBucket && col(idCol) === col("__anchor"), 1L)
          .otherwise(0L)).as("hot_buckets"),
        sum(when(col("__bsz") > maxBucket, 1L).otherwise(0L)).as("hot_members"),
        max(col("__bsz")).as("largest_bucket"))
    val small = annotated
      .filter(col("__bsz") <= maxBucket)
      .select(bucket :+ col(idCol): _*)
    val smallPairs = small
      .toDF(bucketCols :+ outA: _*)
      .join(small.toDF(bucketCols :+ outB: _*), bucketCols)
      .filter(col(outA) < col(outB))
      .select(bucket :+ col(outA) :+ col(outB): _*)
    val starPairs = annotated
      .filter(col("__bsz") > maxBucket && col(idCol) =!= col("__anchor"))
      .select(bucket :+ col("__anchor").as(outA) :+ col(idCol).as(outB): _*)
    smallPairs.unionByName(starPairs)
  }

  /** [[cappedBandPairs]] with payload columns carried THROUGH the bucket
    * join: output `(bucketCols…, outA, outB, <p>_a, <p>_b …)` with both
    * sides' payloads attached, so the caller can verify (cosine, signature
    * agreement) INSIDE the join's output stream and keep only survivors.
    *
    * When to use which: the slim variant + re-attach is right when the
    * payload is large relative to the candidate count (containment's
    * shingle arrays — candidates are linear and pre-filtered). This
    * variant is right when candidates outnumber corpus rows by orders of
    * magnitude (RP-LSH / within-cell all-pairs at ~100 per bucket →
    * ~50 candidates per row per band): re-attaching a 0.5 KB vector to a
    * quadratic-in-bucket pair frame makes the pair frame the dominant
    * shuffle (measured: the sf10 probe's embedding verify sorted tens of
    * GB and filled the disk), while carrying the payload through the
    * band shuffle costs corpus × bands — linear — and the pair stream
    * with both payloads exists only INSIDE the join's output pipeline,
    * never on disk.
    */
  def cappedBandPairsWithPayload(
      banded: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      payloadCols: Seq[String],
      outA: String,
      outB: String,
      maxBucket: Int = DefaultMaxBucket,
      tag: String = "lsh_cap",
      pinned: Boolean = false): DataFrame = {
    val bucket = bucketCols.map(col)
    val wAll = Window.partitionBy(bucket: _*)
    // the anchor's payload rides inside the min-struct: id leads and ids
    // are unique, so the struct ordering never compares the payload fields
    val annotated = (if (pinned) pinWidth(banded, bucket) else banded)
      .withColumn("__bsz", count(lit(1)).over(wAll))
      .withColumn("__anchor",
        min(struct((col(idCol) +: payloadCols.map(col)): _*)).over(wAll))
      .observe(
        tag,
        sum(when(col("__bsz") > maxBucket &&
          col(idCol) === col("__anchor").getField(idCol), 1L)
          .otherwise(0L)).as("hot_buckets"),
        sum(when(col("__bsz") > maxBucket, 1L).otherwise(0L)).as("hot_members"),
        max(col("__bsz")).as("largest_bucket"))
    val small = annotated
      .filter(col("__bsz") <= maxBucket)
      .select(bucket ++ (col(idCol) +: payloadCols.map(col)): _*)
    val aSide = small.toDF(bucketCols ++ (outA +: payloadCols.map(_ + "_a")): _*)
    val bSide = small.toDF(bucketCols ++ (outB +: payloadCols.map(_ + "_b")): _*)
    val smallPairs = aSide.join(bSide, bucketCols)
      .filter(col(outA) < col(outB))
      .select(bucket ++ Seq(col(outA), col(outB)) ++
        payloadCols.flatMap(p => Seq(col(s"${p}_a"), col(s"${p}_b"))): _*)
    val starPairs = annotated
      .filter(col("__bsz") > maxBucket &&
        col(idCol) =!= col("__anchor").getField(idCol))
      .select(bucket ++ Seq(col("__anchor").getField(idCol).as(outA),
        col(idCol).as(outB)) ++
        payloadCols.flatMap(p => Seq(col("__anchor").getField(p).as(s"${p}_a"),
          col(p).as(s"${p}_b"))): _*)
    smallPairs.unionByName(starPairs)
  }
}
