package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph construction + analysis operators (north-star extension,
  * alongside [[DedupOps.connectedComponents]] / [[DedupOps.pageRank]]):
  * the "build a similarity graph from co-occurrence, then analyze it"
  * pipeline a production dedup/recommendation system runs over its
  * entity tables.
  *
  * Every stage is fan-out-bounded — the house candidate-generator
  * discipline:
  *  - co-occurrence pair expansion is capped per group key (an
  *    uncapped hot key would emit O(groupSize²) pairs);
  *  - the graph keeps only each node's top-k strongest neighbors, so
  *    edge count is ≤ k·n regardless of how dense co-occurrence is;
  *  - triangle counting orients every edge from its lower-(degree,id)
  *    endpoint to its higher one, so a node's out-degree is bounded by
  *    O(√m) and the 2-path join does O(m^1.5) work total instead of
  *    Σ deg² (the standard orientation bound — on a skewed graph the
  *    hub's quadratic fan-out moves to its many low-degree neighbors).
  */
object GraphOps {

  /** Pack the (degree, id) orientation key into one comparable Long:
    * total order = degree, then id. Ids must be < 10^9 (holds for every
    * key space in the test tables); degrees are ≤ n < 10^9, so the
    * product stays far below Long range. A single Long key keeps the
    * orientation compare codegen-friendly and trivially portable to the
    * SQL oracle (struct/row comparison semantics differ across engines;
    * integer compare doesn't).
    */
  private val OrientBase = 1000000000L

  /** Weighted co-occurrence pairs: members sharing a group key become a
    * pair weighted by how many keys they share. The per-key member list
    * is capped at `maxMembersPerKey` (smallest ids kept — deterministic
    * under any partitioning) BEFORE the in-row pair expansion, so one
    * hot key expands to at most O(cap²) pairs — same discipline as
    * x16's token cap and every LSH bucket cap. One hash-agg to build
    * the capped lists, one narrow double-explode, one hash-agg to
    * count: two shuffles total, both with map-side partials.
    */
  def coOccurrenceWeights(pairs: DataFrame, keyCol: String,
      memberCol: String, maxMembersPerKey: Int): DataFrame = {
    // no .distinct() before the groupBy: collect_set dedups (k,m) by
    // definition, and a distinct would add a full extra shuffle of the
    // raw input on a different key
    val capped = pairs
      .select(col(keyCol).as("k"), col(memberCol).cast("long").as("m"))
      .groupBy("k")
      .agg(slice(sort_array(collect_set(col("m"))), 1, maxMembersPerKey)
        .as("ms"))
    // ordered-pair expansion: `ms` is sorted asc, so pairing element i
    // with the tail after it yields exactly the C(s,2) a<b pairs —
    // half the rows of a full s² cross-explode + filter
    capped
      .select(col("ms"), posexplode(col("ms")))
      .select(col("col").as("a"),
        explode(slice(col("ms"), col("pos") + lit(2),
          lit(maxMembersPerKey))).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
  }

  /** Top-k similarity graph from weighted pairs: each node keeps its k
    * strongest neighbors (weight desc, neighbor id asc as the unique
    * tiebreak), and an undirected edge survives if EITHER endpoint kept
    * it (union-mutualization — the usual k-NN-graph construction).
    * Edge count is ≤ k·n by construction, which is what makes the
    * downstream triangle join safe on arbitrarily dense co-occurrence:
    * thresholding by absolute weight is data-distribution-tuned (the
    * mean shared-key count shifts with scale), but "your k closest"
    * is not. One shuffle for the per-node window, one distinct.
    */
  def topKNeighborGraph(weights: DataFrame, k: Int): DataFrame = {
    // symmetrize with a narrow 2-row explode, not a self-union: a union
    // references `weights` twice, and in a composed pipeline every extra
    // reference re-expands the whole upstream co-occurrence subtree
    val sym = weights.select(col("w"), explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("w"))
    val win = Window.partitionBy("u").orderBy(col("w").desc, col("v").asc)
    sym.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()
  }

  /** Per-node triangle counts over an undirected edge list (`a` < `b`
    * per row, no duplicates — [[topKNeighborGraph]]'s contract).
    *
    * Degree-oriented algorithm: every edge points from its lower
    * (degree, id) endpoint to its higher one; a triangle {u,v,w} is
    * found exactly once as two out-edges u→v, u→w (v before w in
    * orientation order) whose closing edge v→w exists. The per-node
    * count then explodes each found triangle to its three corners and
    * hash-aggregates. Joins are all on 8-byte keys; the orientation
    * key packs (degree, id) into one Long ([[OrientBase]]) so the
    * v-before-w predicate is a primitive compare inside codegen.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // The triangle join necessarily references the edge list many times
    // (degrees, orientation join, both 2-path sides, the closing probe).
    // Without lineage cuts those references multiply: each re-expands
    // the full upstream pipeline (measured 60 copies of the co-occurrence
    // aggregate in the composed d10 plan). localCheckpoint (the d7/d9
    // pattern) collapses each shared frame to one persisted RDD — no
    // CacheManager entry to leak, computed once at the first action,
    // MEMORY_AND_DISK so a 100 TB edge list spills instead of OOMing.
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .localCheckpoint(eager = false)
    val deg = e.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    val keyed = e
      .join(deg.select(col("id").as("a"),
        (col("deg") * OrientBase + col("a")).as("oka")), Seq("a"))
      .join(deg.select(col("id").as("b"),
        (col("deg") * OrientBase + col("b")).as("okb")), Seq("b"))
    val oriented = keyed.select(
      when(col("oka") < col("okb"), col("a")).otherwise(col("b")).as("u"),
      when(col("oka") < col("okb"), col("b")).otherwise(col("a")).as("v"),
      greatest(col("oka"), col("okb")).as("okv"))
      .localCheckpoint(eager = false)
    val e1 = oriented.select(col("u"), col("v").as("v1"),
      col("okv").as("ok1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"),
      col("okv").as("ok2"))
    val paths = e1.join(e2, Seq("u")).filter(col("ok1") < col("ok2"))
    val closing = oriented.select(col("u").as("v1"), col("v").as("v2"))
    val tris = paths.join(closing, Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
    tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Node-pair similarity over an undirected edge list (`a` < `b` per
    * row, no duplicates — [[topKNeighborGraph]]'s contract):
    * common-neighbor count and neighbor-set Jaccard for every pair of
    * nodes sharing at least one neighbor. The 2-path expansion is the
    * classic hub hazard — a degree-D shared neighbor pairs C(D,2)
    * candidates — so each HUB contributes at most `maxAdj` of its
    * (id-ordered, deterministic) incident arcs to path generation:
    * worst-case fan-out is C(maxAdj,2) per node at ANY degree
    * distribution, the same cap discipline as every candidate
    * generator here. True (uncapped) degrees feed the Jaccard
    * denominator, so the cap bounds candidate RECALL through
    * super-hubs, never the similarity value itself. Shape: one
    * symmetrize explode, one degree agg, one per-hub window, one
    * equi-join on the hub key, two degree joins — all shuffles on
    * 8-byte keys with map-side partials.
    */
  def commonNeighborPairs(edges: DataFrame, maxAdj: Int): DataFrame = {
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .localCheckpoint(eager = false)
    val sym = e.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("x"))
      .select(col("x.u").as("u"), col("x.v").as("v"))
      .localCheckpoint(eager = false)
    val deg = sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    val hubWin = Window.partitionBy("v").orderBy(col("u").asc)
    val capped = sym.withColumn("rn", row_number().over(hubWin))
      .filter(col("rn") <= maxAdj)
      .localCheckpoint(eager = false)
    val s1 = capped.select(col("v"), col("u").as("x"))
    val s2 = capped.select(col("v"), col("u").as("y"))
    val cn = s1.join(s2, Seq("v")).filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("common"))
    cn.join(deg.select(col("id").as("x"), col("deg").as("deg_x")),
        Seq("x"))
      .join(deg.select(col("id").as("y"), col("deg").as("deg_y")),
        Seq("y"))
      .select(col("x"), col("y"), col("common"),
        round(col("common") /
          (col("deg_x") + col("deg_y") - col("common")), 6)
          .as("nbr_jaccard"))
  }

  /** k-core decomposition by iterative peeling: repeatedly delete every
    * node whose current degree is < k until none remains, then report
    * each surviving node's within-core degree. The k-core is the UNIQUE
    * maximal subgraph of min-degree ≥ k — peel order doesn't matter —
    * which is what lets an iterative Spark loop hash-match a SQL oracle
    * that unrolls the peel: both converge to the same fixpoint, and
    * extra unrolled rounds past convergence are no-ops.
    *
    * Shape per round (the d7/d9 iterative discipline): one hash-agg for
    * degrees, one bounded probe action on the peel set, two anti-joins
    * to drop edges touching peeled nodes; every round's edge list is
    * lineage-cut via localCheckpoint so the plan stays constant-size at
    * any round count. Converges in O(rounds) ≤ the graph's degeneracy
    * ordering depth; a non-convergent input fails loudly rather than
    * returning a partial peel.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 20): DataFrame = {
    var e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .localCheckpoint(eager = false)
    def degrees(ed: DataFrame): DataFrame = ed
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("core_deg"))
    var round = 0
    var converged = false
    while (!converged) {
      val bad = degrees(e).filter(col("core_deg") < k).select(col("id"))
        .localCheckpoint(eager = false)
      // ONE action per round: the probe materializes `bad` into its
      // checkpoint as a side effect (doCheckpoint computes partitions
      // the limit(1) skipped before truncating lineage)
      if (bad.limit(1).count() == 0) converged = true
      else {
        round += 1
        require(round <= maxRounds,
          s"kCore did not converge in $maxRounds peel rounds")
        e = e.join(bad.select(col("id").as("a")), Seq("a"), "left_anti")
          .join(bad.select(col("id").as("b")), Seq("b"), "left_anti")
          .select(col("a"), col("b"))
          .localCheckpoint(eager = false)
      }
    }
    degrees(e)
  }

  /** Synchronous label propagation (deterministic LPA), `rounds` fixed
    * iterations: labels start as node ids; each round every node adopts
    * the most frequent label among its NEIGHBORS (count desc, label asc
    * — the unique tiebreak that makes synchronous LPA reproducible; the
    * classic randomized tie-break cannot hash-match anything). A fixed
    * round count sidesteps LPA's known bipartite oscillation — the
    * caller picks the horizon, and the oracle unrolls exactly the same
    * rounds.
    *
    * Shape per round (the d7/d9/kCore iterative discipline): one
    * equi-join of the symmetrized edges to the label frame + one
    * hash-agg of votes + one per-node window argmax — everything moves
    * O(edges), never corpus payloads, and each round's labels are
    * lineage-cut so the plan stays constant-size at any round count.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val sym = edges.select(explode(array(
        struct(col("a").cast("long").as("u"), col("b").cast("long").as("v")),
        struct(col("b").cast("long").as("u"), col("a").cast("long").as("v"))))
        .as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .localCheckpoint(eager = false)
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    var i = 0
    while (i < rounds) {
      val votes = sym
        .join(labels.select(col("id").as("v"), col("lbl")), Seq("v"))
        .groupBy("u", "lbl").agg(count(lit(1)).as("n"))
      val win = Window.partitionBy("u")
        .orderBy(col("n").desc, col("lbl").asc)
      labels = votes.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("u").as("id"), col("lbl"))
        .localCheckpoint(eager = false)
      i += 1
    }
    labels
  }

  /** Convenience composition: co-occurrence → top-k graph → per-node
    * triangle counts, returning the `topK` most triangle-dense nodes
    * (count desc, id asc). The full "similarity-graph analytics"
    * pipeline in one call.
    */
  def cooccurrenceTriangles(pairs: DataFrame, keyCol: String,
      memberCol: String, maxMembersPerKey: Int, neighborsK: Int,
      topK: Int): DataFrame = {
    val counts = triangleCounts(
      topKNeighborGraph(
        coOccurrenceWeights(pairs, keyCol, memberCol, maxMembersPerKey),
        neighborsK))
    RelationalOps.topKGlobal(counts,
      Seq(col("n_triangles").desc, col("id").asc), topK)
  }

  /** Multi-source BFS hop distances over the undirected edge set:
    * `rounds` synchronous frontier expansions from `sources` (a frame
    * with one `id` column, dist 0). Each round is ONE equi-join of the
    * current frontier to the symmetrized edges + one anti-join against
    * the discovered set + a distinct — everything moves O(frontier·
    * avg_deg) keys, never payloads, and frontier/discovered are
    * lineage-cut per round (the kCore/LPA discipline) so the plan
    * stays constant-size at any horizon. First discovery IS the
    * shortest hop count (BFS invariant), so the result equals a
    * depth-bounded recursive closure with min(dist) — the exact shape
    * the SQL oracle takes. Nodes beyond `rounds` hops are absent by
    * contract (the bounded-horizon semantics a "within k hops"
    * audience query wants; an unbounded frontier would iterate to the
    * graph diameter).
    */
  def bfsDistances(edges: DataFrame, sources: DataFrame,
      rounds: Int): DataFrame = {
    val sym = edges.select(explode(array(
        struct(col("a").cast("long").as("u"), col("b").cast("long").as("v")),
        struct(col("b").cast("long").as("u"), col("a").cast("long").as("v"))))
        .as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .localCheckpoint(eager = false)
    var discovered = sources
      .select(col("id").cast("long").as("id"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    var frontier = discovered
    var r = 1
    while (r <= rounds) {
      val next = sym
        .join(frontier.select(col("id").as("u")), Seq("u"))
        .select(col("v").as("id")).distinct()
        .join(discovered, Seq("id"), "left_anti")
        .select(col("id"), lit(r.toLong).as("dist"))
        .localCheckpoint(eager = false)
      discovered = discovered.unionAll(next).localCheckpoint(eager = false)
      frontier = next
      r += 1
    }
    discovered
  }
}
