package graft.ops

import graft.SparkSuite

/** Transitive clustering: chains collapse to one component, which the
  * one-hop min-id assignment cannot do. */
class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  test("chain a-b-c-d becomes one component; separate cliques stay apart") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),          // chain 1-2-3-4
      (10L, 11L),                            // pair
      (20L, 21L), (21L, 22L), (20L, 22L)     // triangle
    ).toDF("src", "dst")
    val comps = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(comps(10L) == 10L && comps(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
  }

  test("clusterReps: transitive keep_id, singletons map to themselves") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // 3 !~ 1 directly
    val ids = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val out = ConnectedComponents.clusterReps(ids, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1L, false)))
    assert(out(2L) == ((1L, true)))
    assert(out(3L) == ((1L, true)))  // transitively reaches 1 through 2
    assert(out(9L) == ((9L, false))) // singleton
  }

  test("long chain converges within the iteration budget") {
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val comps = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to n).forall(i => comps(i.toLong) == 1L))
  }
}
