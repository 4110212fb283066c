package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * Pins the bounded-memory discipline of the iterative operators: each
 * round's localCheckpoint must RELEASE the superseded round's blocks,
 * so a k-round loop finishes with O(1) persistent RDD generations —
 * not k (the round-5 bench churn: superseded label blocks accumulated
 * across a run until block-manager pressure degraded later queries).
 *
 * The probe is SparkContext.getPersistentRDDs: unpersist removes the
 * entry synchronously (block deletion is async but the registry is
 * not), so the post-run delta counts exactly the generations still
 * pinned.
 */
class IterativeMemorySpec extends SparkSuite {

  private def pinnedAfter(run: => org.apache.spark.sql.DataFrame): Int = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    run.count()
    val added = (sc.getPersistentRDDs.keySet -- before).toSeq
    // leave the session clean for the other suites
    added.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = true)))
    added.size
  }

  test("connected components pins only the final label generation") {
    import spark.implicits._
    // a 64-node chain needs ~log2(64) pointer-jumping rounds — each
    // would previously pin one label table plus the edge table
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val pinned = pinnedAfter(ConnectedComponents.run(edges))
    assert(pinned <= 1, s"CC left $pinned checkpoint generations pinned")
  }

  test("pageRank pins only the final rank generation") {
    import spark.implicits._
    val edges = (1L to 60L).map(i => (i, i % 20 + 100L)).toDF("src", "dst")
    val pinned = pinnedAfter(Graphs.pageRank(edges, "src", "dst", iters = 6))
    assert(pinned <= 1, s"pageRank left $pinned generations pinned")
  }

  test("hits pins only the final hub/authority generations") {
    import spark.implicits._
    val edges = (1L to 60L).map(i => (i, i % 20 + 100L)).toDF("src", "dst")
    val pinned = pinnedAfter(Graphs.hits(edges, "src", "dst", iters = 5))
    // final h + final a + the nodes table the output joins
    assert(pinned <= 3, s"hits left $pinned generations pinned")
  }

  test("power iteration pins only the final step") {
    import spark.implicits._
    val vecs = (1L to 50L)
      .map(i => (i, Array.tabulate(8)(d => (i % 7 + d).toFloat / 10f)))
      .toDF("vec_id", "embedding")
    val pinned = pinnedAfter(
      Similarity.pcaPowerIteration(vecs, "embedding", "vec_id", iters = 8))
    assert(pinned <= 1, s"power iteration left $pinned steps pinned")
  }

  test("released rounds do not change the computed components") {
    import spark.implicits._
    // two chains + a singleton joiner: transitive merge still exact
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("src", "dst")
    val out = ConnectedComponents.run(edges).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }
}
