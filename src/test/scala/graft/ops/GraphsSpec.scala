package graft.ops

import graft.SparkSuite

class GraphsSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank: exact integer ranks on a hand-computed 3-node graph") {
    // A->B, B->A, C->A (+ a duplicate edge and a self-loop, both dropped)
    val edges = Seq(("A", "B"), ("A", "B"), ("B", "A"), ("C", "A"),
      ("A", "A")).toDF("s", "t")
    // n=3, scale=1e12: r0 = 333333333333 each, base = 50000000000
    // iter1: mass(A)=r0(B)+r0(C)=666666666666 -> r1(A)=50e9+85*mass DIV 100
    //        = 616666666666; r1(B)=333333333333; r1(C)=50000000000
    // iter2: mass(A)=r1(B)+r1(C)=383333333333 -> r2(A)=375833333333
    //        mass(B)=r1(A)=616666666666 -> r2(B)=574166666666
    val out = Graphs.pageRank(edges, "s", "t", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "A" -> 375833333333L, "B" -> 574166666666L, "C" -> 50000000000L))
  }

  test("pageRank: rank order is stable and mass concentrates on sinks-in") {
    // star: everyone links to H
    val edges = (1 to 9).map(i => (s"n$i", "H")).toDF("s", "t")
    val rows = Graphs.pageRank(edges, "s", "t", iters = 3).collect()
    assert(rows.head.getString(0) === "H")            // top rank first
    assert(rows.head.getLong(1) > rows.last.getLong(1) * 5)
    // doubles are the exact scaled division of the integer ranks
    assert(rows.head.getDouble(2) === rows.head.getLong(1) / 1e12)
  }

  test("pageRank input validation") {
    val edges = Seq(("A", "B")).toDF("s", "t")
    intercept[IllegalArgumentException](
      Graphs.pageRank(edges, "s", "t", iters = 0))
    intercept[IllegalArgumentException](
      Graphs.pageRank(edges.filter("s = 'zzz'"), "s", "t"))
  }

  test("triangles: counts and clustering ppm on a hand graph") {
    // triangle {1,2,3}; {1,2,4} via 4-1 and 4-2; pendant edge 5-6;
    // reversed duplicate (2,1) and self-loop (3,3) dropped
    val edges = Seq((1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (5, 6),
      (2, 1), (3, 3)).toDF("s", "t")
    val out = Graphs.triangles(edges, "s", "t")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1) === ((3L, 2L, 666666L)))   // 2*2e6 DIV (3*2)
    assert(out(2) === ((3L, 2L, 666666L)))
    assert(out(3) === ((2L, 1L, 1000000L)))  // its one edge pair closes
    assert(out(4) === ((2L, 1L, 1000000L)))
    assert(out(5) === ((1L, 0L, 0L)))        // deg < 2 -> 0, not div-by-0
    assert(out(6) === ((1L, 0L, 0L)))
    assert(out.size === 6)
  }

  test("triangles: hub star has none; output ordered by node") {
    val star = (1 to 8).map(i => (0, i)).toDF("s", "t")
    val rows = Graphs.triangles(star, "s", "t").collect()
    assert(rows.map(_.getLong(2)).forall(_ === 0L))
    assert(rows.map(_.getInt(0)).toSeq === (0 to 8))
  }

  test("degreeStats: degrees, reciprocity, and silhouettes on a hand graph") {
    // A<->B reciprocal; C fans out to A,B,D with no inbound (farm-like);
    // D receives only (sink-like); duplicate edge and self-loop dropped
    val edges = Seq(("A", "B"), ("A", "B"), ("B", "A"), ("C", "A"),
      ("C", "B"), ("C", "D"), ("A", "D"), ("D", "D")).toDF("s", "t")
    val out = Graphs.degreeStats(edges, "s", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out("A") === ((2L, 2L, 1L, false, false)))
    assert(out("B") === ((1L, 2L, 1L, false, false)))
    assert(out("C") === ((3L, 0L, 0L, false, true)))   // link-farm silhouette
    assert(out("D") === ((0L, 2L, 0L, true, false)))   // sink
    assert(out.size === 4)
  }

  test("hits: star graph pins the hub and its authorities exactly") {
    // X fans out to A, B, C and nothing points at X: X is the unit hub
    // (authority 0), each target a unit authority (hub 0) — exact at
    // every iteration, no truncation on this fixture
    val star = Seq(("X", "A"), ("X", "B"), ("X", "C")).toDF("s", "t")
    val out = Graphs.hits(star, "s", "t", iters = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("X") === ((1000000L, 0L)))
    assert(out("A") === ((0L, 1000000L)))
    assert(out("B") === ((0L, 1000000L)))
    assert(out("C") === ((0L, 1000000L)))
  }

  test("hits: shared target outranks a single-hub target; better hub wins") {
    // X -> A, B; Y -> B: B collects two hubs' mass (unit authority),
    // A one; X points at the stronger authority set, so hub(X) > hub(Y)
    val edges = Seq(("X", "A"), ("X", "B"), ("Y", "B")).toDF("s", "t")
    val out = Graphs.hits(edges, "s", "t", iters = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("B")._2 === 1000000L)                 // max authority
    assert(out("A")._2 < out("B")._2)
    assert(out("X")._1 === 1000000L)                 // max hub
    assert(out("Y")._1 < out("X")._1)
    // determinism: a second run is bit-identical
    val again = Graphs.hits(edges, "s", "t", iters = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(again === out)
    intercept[IllegalArgumentException](
      Graphs.hits(edges, "s", "t", iters = 0))
  }

  test("labelPropagation: two triangles joined by a bridge separate; " +
      "deterministic ties") {
    import spark.implicits._
    // two triangles a1-a2-a3 and b1-b2-b3 with one bridge a3->b1; the
    // hand-traced 4-round synchronous run (min-label ties) converges to
    // community "a1" for the a-side and "a3" for the b-side. Self-loop
    // and duplicate directed edges must drop.
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
      ("a3", "b1"),
      ("a1", "a1"),           // self-loop: dropped
      ("a1", "a2"), ("a2", "a1") // duplicate + reverse of an edge
    ).toDF("s", "t")
    val out = Graphs.labelPropagation(edges, "s", "t", iters = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    val aSide = Seq("a1", "a2", "a3").map(out(_)._1).distinct
    val bSide = Seq("b1", "b2", "b3").map(out(_)._1).distinct
    assert(aSide.length === 1 && bSide.length === 1)
    assert(aSide.head !== bSide.head)
    assert(out.values.forall(_._2 === 3L)) // two communities of 3
    assert(out("a1")._1 === "a1" && out("b1")._1 === "a3") // hand trace
    // determinism: a second run is identical
    assert(Graphs.labelPropagation(edges, "s", "t", iters = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2)))).toMap === out)
    intercept[IllegalArgumentException](
      Graphs.labelPropagation(edges, "s", "t", iters = 0))
  }
}
