package graft.operators

import graft.SparkSpec

/** Large-star/small-star CC: exact labels on planted graphs and the
  * O(log n) round bound on a worst-case path graph.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) = {
    val (labels, rounds) =
      ConnectedComponents.labels(edges.toDF("doc_a", "doc_b"))
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("two components, duplicate and reversed edges") {
    val (lab, _) = run(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L),
      (10L, 11L), (11L, 12L), (10L, 11L)))
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("64-node path converges in O(log n) rounds with exact labels") {
    val chain  = (1L until 64L).map(i => (i, i + 1))
    val (lab, rounds) = run(chain)
    assert(lab == (1L to 64L).map(_ -> 1L).toMap)
    // diameter 63; per-round star contraction halves path length —
    // label propagation without jumps would need ~63 rounds
    assert(rounds <= 8, s"path graph took $rounds rounds")
  }

  test("star, triangle and singleton-pair mix") {
    val star     = (2L to 9L).map(i => (i, 1L))
    val triangle = Seq((20L, 21L), (21L, 22L), (22L, 20L))
    val pair     = Seq((31L, 30L))
    val selfLoop = Seq((40L, 40L)) // ignored, contributes no nodes
    val (lab, _) = run(star ++ triangle ++ pair ++ selfLoop)
    assert(lab == ((1L to 9L).map(_ -> 1L) ++
      (20L to 22L).map(_ -> 20L) ++ Seq(30L -> 30L, 31L -> 30L)).toMap)
  }
}
