package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star rounds (the MapReduce CC algorithm of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — public):
  * provably O(log n) rounds, each round exactly TWO keyed shuffles
  * (a groupBy-min and its re-join per star step), no driver-side data.
  *
  * Every edge is kept oriented (u > v). large-star hangs each node's
  * strictly-larger neighbors onto the minimum of its neighborhood;
  * small-star re-hangs the smaller neighbors. At the fixpoint the edge
  * set IS the star forest (node → component minimum), so labels fall out
  * without a separate propagation pass.
  *
  * Replaces per-round neighbor-min label propagation + pointer jumping:
  * same O(log n) bound but half the shuffles per round and a single
  * set-equality convergence probe instead of a changed-label count.
  */
object ConnectedComponents {

  /** (labels, rounds): `labels(id, label)` assigns every node appearing
    * in `pairs` (two id columns) the minimum node id of its component.
    */
  def labels(pairs: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    val cols = pairs.columns
    require(cols.length == 2, s"expected two id columns, got ${cols.toSeq}")
    var cur = pairs
      .select(
        greatest(col(cols(0)), col(cols(1))).as("u"),
        least(col(cols(0)), col(cols(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      // truncate lineage so each round's plan stays O(1); lazy — the
      // count below materializes it in the same job. Reliable checkpoint
      // when a checkpoint dir is set (cluster), executor-local otherwise.
      .transform(g => Reuse.lineageCut(g, eager = false))
    var (curCount, curDigest) = countAndDigest(cur)
    var converged = curCount == 0L
    var rounds    = 0
    while (!converged) {
      require(rounds < maxRounds,
        s"large/small-star not converged after $rounds rounds — graph bug?")
      // LAZY checkpoint: the count+digest below materializes it in the
      // same job, so a round costs one job (+ the exact set-equality
      // probe only when BOTH the count and the digest match)
      val next = Reuse.lineageCut(smallStar(largeStar(cur)), eager = false)
      val (nextCount, nextDigest) = countAndDigest(next)
      // Distinct sets of equal size are equal iff the difference is
      // empty. The order-independent xor digest rides the SAME agg job
      // as the count and LOSSLESSLY gates the except: unequal digests
      // PROVE the sets differ (so the except job is skipped on rounds
      // where the edge count has plateaued but labels still move), while
      // equal count+digest still runs the exact probe — a digest
      // collision costs one redundant except, never a wrong answer.
      converged = nextCount == curCount && nextDigest == curDigest &&
        next.except(cur).isEmpty
      cur = next
      curCount = nextCount
      curDigest = nextDigest
      rounds += 1
    }
    val labels = cur.select(col("u").as("id"), col("v").as("label"))
      .unionByName(cur.select(col("v").as("id"), col("v").as("label")))
      .distinct()
    (labels, rounds)
  }

  /** (edge count, order-independent xxhash64-xor digest) of a distinct
    * edge set, in one agg job. The digest's only use is PROVING
    * inequality (see the loop) — equality always falls through to the
    * exact `except` probe, so a collision can never change the result.
    */
  private def countAndDigest(e: DataFrame): (Long, Long) = {
    val row = e.select(xxhash64(col("u"), col("v")).as("h"))
      .agg(count(lit(1)).as("c"), expr("bit_xor(h)").as("d"))
      .head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** For each node u: connect every strictly-larger neighbor to
    * m = min(Γ(u) ∪ {u}). Connectivity-preserving (Kiveris Lemma 1).
    *
    * NOT deduplicated here: duplicate (v, m) edges (at most deg(v) of
    * them) flow into [[smallStar]], whose groupBy-min and final distinct
    * both collapse them MAP-SIDE (partial aggregation) before any
    * shuffle — so skipping the dedup saves one full shuffle per round
    * without growing the shuffled volume.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** For each node u over (u > v)-oriented edges: re-hang all smaller
    * neighbors (and u itself) onto m = min neighbor.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min(col("v")).as("m"))
    e.join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .unionByName(m.select(col("u"), col("m").as("v")))
      .distinct()
  }
}
