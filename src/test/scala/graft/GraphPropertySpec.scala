package graft

import scala.util.Random

/** Randomized differential tests of the graph operators against
  * in-memory brute-force references: Erdős–Rényi-ish graphs small
  * enough to enumerate exactly, seeds fixed for reproducibility. The
  * hand-built GraphOpsSpec cases pin known shapes (K4, wheel, chains);
  * these explore arbitrary shapes — disconnected pieces, isolated
  * triangles, dense pockets — where an orientation or peel-order bug
  * would hide. Kept to a handful of graphs because each operator run
  * is a full Spark job (the triangle pipeline checkpoints, the peel
  * loop runs probe actions).
  */
class GraphPropertySpec extends SparkTestBase {
  import graft.operators.GraphOps

  private def randomGraph(seed: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    val n = 5 + rnd.nextInt(8) // 5..12 nodes
    val p = 0.25 + rnd.nextDouble() * 0.45
    (for {
      a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < p
    } yield (a, b)).toSeq
  }

  private def adjacency(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = adjacency(edges)
    val tri = for {
      (a, b) <- edges
      c <- adj(a) if c > b && adj(b).contains(c)
    } yield Seq(a, b, c)
    tri.flatten.groupBy(identity)
      .map { case (k, vs) => k -> vs.size.toLong }
  }

  private def bruteKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var adj = adjacency(edges)
    var done = false
    while (!done) {
      val bad = adj.collect { case (n, s) if s.size < k => n }.toSet
      if (bad.isEmpty) done = true
      else adj = adj.collect { case (n, s) if !bad(n) =>
        n -> (s -- bad)
      }.filter(_._2.nonEmpty)
    }
    adj.map { case (n, s) => n -> s.size.toLong }
  }

  test("triangleCounts matches brute force on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val edges = randomGraph(seed)
      val expected = bruteTriangles(edges)
      val got = GraphOps.triangleCounts(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed edges=$edges")
    }
  }

  test("kCore matches brute force on random graphs") {
    import spark.implicits._
    for (seed <- 5 to 8; k <- Seq(2, 3)) {
      val edges = randomGraph(seed)
      val expected = bruteKCore(edges, k)
      val got = GraphOps.kCore(edges.toDF("a", "b"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed k=$k edges=$edges")
    }
  }

  /** Reference BFS: level-synchronous frontier walk over the adjacency
    * map, horizon-bounded like the operator.
    */
  private def bruteBfs(edges: Seq[(Long, Long)], sources: Set[Long],
      rounds: Int): Map[Long, Long] = {
    val adj = adjacency(edges)
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    for (r <- 1 to rounds) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> r.toLong)
      frontier = next
    }
    dist
  }

  test("bfsDistances matches brute force on random graphs") {
    import spark.implicits._
    for (seed <- 9 to 12; rounds <- Seq(2, 4)) {
      val edges = randomGraph(seed)
      if (edges.nonEmpty) {
        // seeds: the 2 smallest node ids present (may sit in
        // different components — multi-source min must still hold)
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val sources = nodes.take(2).toSet
        val expected = bruteBfs(edges, sources, rounds)
        val got = GraphOps.bfsDistances(edges.toDF("a", "b"),
            sources.toSeq.toDF("id"), rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"seed=$seed rounds=$rounds edges=$edges")
      }
    }
  }
}
