package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph operators over edge lists — the web/host-graph signals
 * a corpus-curation pipeline derives from link structure (host authority
 * for quality weighting: a page's host rank is a standard feature in
 * crawl-corpus filtering, alongside the text-level signals in
 * TextAnalysis).
 */
object Graphs {

  /**
   * PageRank with EXACT integer arithmetic: ranks are `scale`-denominator
   * fixed point (default 1e12) and every update is integer
   * multiply/divide —
   *
   *   r_{t+1}(v) = base + 85 · (Σ_{u→v} r_t(u) DIV out(u)) DIV 100,
   *   base = (15 · scale DIV 100) DIV n,  r_0(v) = scale DIV n
   *
   * — so a FIXED iteration count yields bit-identical ranks on any
   * engine (float PageRank diverges across summation orders; truncating
   * DIV + exact BIGINT sums make the oracle an unrolled SQL of the same
   * arithmetic). Self-loops and duplicate edges are dropped.
   * Dangling-node mass is dropped too (the standard simplification:
   * ranks then sum to < scale; relative ordering — what curation
   * weighting consumes — is unaffected).
   *
   * Scale shape per round: one src-keyed join of the rank table against
   * the edge list + one dst-keyed sum with map-side partials — rank rows
   * are (node, long) and the edge list is materialized once
   * (`localCheckpoint`) and reused every round, with each round's rank
   * table checkpointed so the logical plan stays flat across iterations
   * (the ConnectedComponents device). The one driver-side value is the
   * node COUNT (a scalar, not a collect).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    require(scale >= 100L, s"scale must be >= 100, got $scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out"))
      .localCheckpoint(true)
    val base = (scale * 15L / 100L) / n
    var r = nodes.withColumn("pr", lit(scale / n))
    for (_ <- 1 to iters) {
      val mass = e.join(r.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst"), expr("pr DIV out").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("mass"))
      val next = nodes
        .join(mass.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("85 * coalesce(mass, 0) DIV 100")).as("pr"))
        .localCheckpoint(true)
      // superseded rank generation: released the moment the next one is
      // materialized (no-op on the round-0 non-checkpoint state)
      IterativeMemory.release(r)
      r = next
    }
    // the final ranks are a self-contained checkpoint — the loop inputs'
    // blocks are unreachable from the returned plan
    IterativeMemory.release(e)
    IterativeMemory.release(nodes)
    IterativeMemory.release(outDeg)
    r.select(col("node"), col("pr").as("pr_scaled"),
        (col("pr").cast("double") / lit(scale.toDouble)).as("pagerank"))
      .orderBy(col("pr_scaled").desc, col("node"))
  }

  /**
   * HITS hubs & authorities (Kleinberg '99) with EXACT integer
   * arithmetic — the directional complement of [[pageRank]]: a page
   * pointing at many good authorities is a hub (a crawl seed-list
   * candidate); a page pointed at by many good hubs is an authority
   * (a quality-weighting signal like g01's rank).
   *
   *   a_{t+1}(v) = Σ_{u→v} h_t(u),  then renormalize max→`scale`;
   *   h_{t+1}(u) = Σ_{u→v} a_{t+1}(v), renormalize — one truncating
   *   division per node per half-step (`(m·scale) DIV max(m)`, widened
   *   through DECIMAL(38,0): m ≤ n·scale ≈ 1e15 at 1e9 hosts, ×1e6
   *   overflows BIGINT), h_0 = a_0 = scale.
   *
   * Max-renormalization instead of L2 keeps the fixed-iteration scheme
   * sqrt-free and exact (the e16 device), so ranks are bit-identical on
   * any engine. Self-loops and duplicate edges drop; nodes without
   * in-edges (out-edges) hold authority (hub) exactly 0.
   *
   * Scale shape per round: two edge-keyed joins + keyed sums with
   * map-side partials (rank rows are (node, long)); the edge list is
   * checkpointed once and each half-step's rank table checkpointed so
   * the plan stays flat across iterations.
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 4, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)

    // checkpoint-FIRST (r15, guide §5 iterative-lineage discipline): the
    // old shape computed `mx` as a broadcast scalar subquery over the
    // live `full` plan, so materializing the scaled checkpoint executed
    // the edge join + aggregation TWICE per half-step (once under the
    // broadcast build, once in the main path). Materializing `full`
    // once and collecting the 1-value max as a driver literal trades
    // one tiny extra job for half the plan executions; the scaled
    // arithmetic is unchanged (same DECIMAL(38,0) DIV, mx as literal).
    def renorm(mass: DataFrame): DataFrame = {
      val full = nodes.join(mass, Seq("node"), "left")
        .select(col("node"), coalesce(col("m"), lit(0L)).as("m"))
        .localCheckpoint(true)
      val mxRow = full.agg(max(col("m"))).head()
      // null max (empty node set) clamps to 1 like the old
      // greatest(max, 1) did
      val mx = if (mxRow.isNullAt(0)) 1L
        else math.max(1L, mxRow.getLong(0))
      val out = full.select(col("node"), expr(
          s"CAST((CAST(m AS DECIMAL(38,0)) * ${scale}L) DIV ${mx}L AS BIGINT)")
          .as("s"))
        .localCheckpoint(true)
      IterativeMemory.release(full)
      out
    }

    var h = nodes.withColumn("s", lit(scale))
    var a = nodes.withColumn("s", lit(scale))
    for (_ <- 1 to iters) {
      val aNext = renorm(e.join(h.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("s")).as("m"))
        .withColumnRenamed("dst", "node"))
      // each half-step supersedes one side's previous generation —
      // release it as soon as the replacement is materialized (no-op on
      // the round-0 non-checkpoint states)
      IterativeMemory.release(a)
      a = aNext
      val hNext = renorm(e.join(a.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src")).agg(sum(col("s")).as("m"))
        .withColumnRenamed("src", "node"))
      IterativeMemory.release(h)
      h = hNext
    }
    // the output joins nodes/h/a only — the edge list is unreachable
    IterativeMemory.release(e)
    nodes
      .join(h.withColumnRenamed("s", "hub_scaled"), "node")
      .join(a.withColumnRenamed("s", "auth_scaled"), "node")
      .select(col("node"), col("hub_scaled"), col("auth_scaled"),
        (col("hub_scaled").cast("double") / lit(scale.toDouble)).as("hub"),
        (col("auth_scaled").cast("double") / lit(scale.toDouble))
          .as("authority"))
      .orderBy(col("node"))
  }

  /**
   * Per-node triangle count + local clustering coefficient over the
   * UNDIRECTED simplification of an edge list — the link-graph
   * cohesion signal (genuine community hosts sit in many triangles;
   * link farms form stars and near-zero clustering).
   *
   * Exact integers throughout: `clustering_ppm` is
   * `2·T·1e6 DIV (deg·(deg−1))` (truncating), 0 when deg < 2.
   *
   * Scale shape — degree-ordered orientation (the compact-forward
   * algorithm, Latapy 2008): each undirected edge is oriented from its
   * (degree, node)-smaller endpoint to the larger, so every node's
   * out-degree is O(√m) on any graph and the wedge set (the quadratic
   * intermediate) is Σ C(out,2) = O(m^1.5) instead of Σ C(deg,2),
   * which a hub would otherwise blow up. Each triangle is generated
   * exactly once, at its order-minimal vertex, and closed by one
   * equi-join against the oriented edge list; every shuffle row is a
   * 2-or-3-column id tuple. The oracle counts the same triangle set
   * with the simpler min-id wedge (the SET is orientation-invariant).
   */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // undirected canonical edges (a < b), nulls/self-loops/dups dropped
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient by (degree, node): u -> v iff (deg_u, u) < (deg_v, v)
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("degree", "db"), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        // the head endpoint's (degree, node) key orders the wedge arms
        when(aFirst, struct(col("db").as("d"), col("b").as("n")))
          .otherwise(struct(col("da").as("d"), col("a").as("n"))).as("vk"))
      .localCheckpoint(true)
    // wedges at the order-minimal vertex: (u->v, u->w) with v <ord w,
    // closed by the oriented edge v->w
    val tri = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.vk.d") < col("e2.vk.d") ||
           (col("e1.vk.d") === col("e2.vk.d") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      .join(oriented.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_ppm",
        when(col("degree") >= 2,
          expr("2 * n_triangles * 1000000 DIV (degree * (degree - 1))"))
          .otherwise(lit(0L)))
      .orderBy(col("node"))
  }

  /**
   * Per-node degree/link-structure report — the cheap (non-iterative)
   * link signals crawl curation reads before anything PageRank-shaped:
   * out-degree, in-degree, and the node's RECIPROCAL edge count (links
   * whose reverse edge also exists). A high-out/zero-in host is the
   * link-farm/SEO-spam silhouette; near-total reciprocity flags link
   * exchanges — both standard crawl-quality features, exact integers.
   *
   * Edges normalize like [[pageRank]] (nulls and self-loops dropped,
   * duplicates collapsed) so the two reports describe the same graph.
   *
   * Scale: degree counts are node-keyed aggregations with map-side
   * partials; reciprocity is one self-equi-join of the (src, dst) edge
   * list on the reversed key — every shuffle carries 2-column edge rows,
   * and nothing is iterative or global.
   */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val inDeg = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    // an edge (a,b) is reciprocal iff (b,a) exists; count per source node
    val recip = e.as("f").join(e.as("r"),
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
      .groupBy(col("f.src").as("node"))
      .agg(count(lit(1)).as("n_reciprocal"))
    outDeg.join(inDeg, Seq("node"), "full_outer")
      .join(recip, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("n_reciprocal"), lit(0L)).as("n_reciprocal"))
      .withColumn("is_sink_like",
        col("out_deg") === 0L && col("in_deg") > 0L)
      .withColumn("is_farm_like",
        col("in_deg") === 0L && col("out_deg") >= 3L)
      .orderBy(col("node"))
  }

  /**
   * Synchronous label-propagation communities (Raghavan et al. 2007,
   * "Near linear time algorithm to detect community structures in
   * large-scale networks") over the UNDIRECTED view of the edge list —
   * the community signal a curation pipeline groups hosts by (mirror
   * farms, site families, link rings share a community long before
   * they share text).
   *
   * Made DETERMINISTIC (the paper breaks ties randomly and updates
   * asynchronously, which is unreproducible across engines): updates
   * are synchronous over a FIXED round count, every node starts as its
   * own label, each round takes the most frequent neighbor label with
   * ties to the SMALLEST label — counts are exact integers and the
   * tie-break is a total order, so an unrolled SQL of the same rule is
   * bit-identical (the g01/g04 oracle device). Self-loops and duplicate
   * directed edges drop; the neighbor multiset counts each distinct
   * undirected neighbor once. Output: (node, community, n_members).
   *
   * Scale shape per round: one dst-keyed join of the label table
   * against the symmetrized edge list, a (src, label) count with
   * map-side partials, and a per-node min over (−count, label) structs
   * — label rows are (string, string), each round's table is
   * checkpointed and the superseded generation released
   * ([[IterativeMemory]]), so memory and lineage stay flat. Every node
   * in the symmetrized list has ≥ 1 neighbor, so no isolated-node
   * branch exists to diverge from the oracle.
   */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val sym = e0
      .unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("community"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val counts = sym
        .join(labels.select(col("node").as("dst"),
          col("community").as("lbl")), "dst")
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
      // min over (−count, label): largest count, then smallest label —
      // one aggregate, no per-node window
      val next = counts
        .groupBy(col("src"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("src").as("node"), col("m.l").as("community"))
        .localCheckpoint(true)
      IterativeMemory.release(labels)
      labels = next
    }
    val sizes = labels.groupBy(col("community"))
      .agg(count(lit(1)).as("n_members"))
    val out = labels.join(sizes, "community")
      .select(col("node"), col("community"), col("n_members"))
      .orderBy(col("node"))
    IterativeMemory.release(sym)
    out
  }
}
