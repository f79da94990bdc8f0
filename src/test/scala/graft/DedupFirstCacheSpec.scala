package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

/** Pins the dedup-first shared-pair identity (VERDICT r14 #1): clone
  * collapse → weighted-df-capped keeper intersections → post-filter
  * expansion must reproduce the RAW-corpus intersection chain
  * bit-for-bit, including on corpora where clone multiplicity pushes a
  * shingle's raw df OVER the cap (the case a naive keeper-df cap gets
  * wrong: the raw chain drops the shingle, keeper-count df would keep
  * it, and intersection counts silently diverge).
  */
class DedupFirstCacheSpec extends SparkTestBase {
  import spark.implicits._

  /** Clone-heavy fixture: a 4-clone clique, a 3-clone clique that is a
    * near-dup of it, a containment pair, an unrelated doc, a pair of
    * empty docs (clone clique with zero shingles), and a short doc. The
    * shared shingle "x y z" appears in 7 raw docs — over the cap of 5 —
    * while its keeper df is 2.
    */
  private lazy val docs = Seq(
    (1L, "x y z a b c d e f g"),
    (2L, "x y z a b c d e f g"),
    (3L, "x y z a b c d e f g"),
    (4L, "x y z a b c d e f g"),
    (10L, "x y z a b c d e f q"), // near-dup of clique {1..4}
    (11L, "x y z a b c d e f q"),
    (12L, "x y z a b c d e f q"),
    (20L, "e f g"),               // contained in clique {1..4} (its one
                                  // shingle has raw df 5 = cap, survives)
    (30L, "totally unrelated content words here now ok"),
    (40L, ""),
    (41L, ""),
    (50L, "a b")                  // too short to shingle
  ).toDF("doc_id", "text")
    .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))

  private val Cap = 5L

  private lazy val shingled = docs
    .select(col("doc_id"), DedupOps.shingleHashes(col("toks"), 3).as("sh"))

  /** The raw-corpus chain (the executable spec). */
  private lazy val raw: DataFrame =
    DedupOps.shingleIntersections(shingled, "doc_id", "sh", Cap)

  /** The dedup-first chain composed from the same primitives
    * QueriesDedup wires into its shared caches.
    */
  private def dedupFirst(pred: org.apache.spark.sql.Column): DataFrame = {
    val mem = DedupOps.cloneMembership(docs, "doc_id", col("toks"))
    val w = mem.groupBy("keeper").agg(count(lit(1)).as("w"))
      .withColumnRenamed("keeper", "doc_id")
    val idx = DedupOps.weightedCappedIndex(shingled.join(w, "doc_id"),
      "doc_id", "sh", "w", Cap)
    val kp = DedupOps.pairIntersectionsFromIndex(idx)
    val cliqueSelf = idx.groupBy(col("id").as("keeper"), col("n"))
      .agg(count(lit(1)).as("surv"))
      .join(mem.groupBy("keeper").agg(count(lit(1)).as("copies"))
        .filter(col("copies") >= 2), Seq("keeper"))
    DedupOps.expandKeeperPairs(kp, cliqueSelf, mem, pred)
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select(col("id_a"), col("id_b"), col("n_a").cast("long"),
      col("n_b").cast("long"), col("inter"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("clone membership elects min-id keepers over identical tokens") {
    val mem = DedupOps.cloneMembership(docs, "doc_id", col("toks"))
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(mem(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(mem(_) == 10L))
    assert(mem(40L) == 40L && mem(41L) == 40L) // empty docs are clones
    assert(mem(20L) == 20L && mem(30L) == 30L && mem(50L) == 50L)
  }

  test("weighted df cap cuts exactly the raw corpus's over-cap shingles") {
    // "x y z" raw df = 7 (> 5) but keeper df = 2: a keeper-count cap
    // would keep it; the weighted cap must drop it, like the raw chain
    val xyz = DedupOps.hash60(lit("sh"), lit("x y z"))
    val mem = DedupOps.cloneMembership(docs, "doc_id", col("toks"))
    val w = mem.groupBy("keeper").agg(count(lit(1)).as("w"))
      .withColumnRenamed("keeper", "doc_id")
    val idx = DedupOps.weightedCappedIndex(shingled.join(w, "doc_id"),
      "doc_id", "sh", "w", Cap)
    assert(idx.filter(col("s") === xyz).count() == 0)
    // an at-cap shingle survives: "e f g" has raw df 5 (docs 1-4 + 20)
    // = cap, kept for keepers 1 and 20
    val efg = DedupOps.hash60(lit("sh"), lit("e f g"))
    assert(idx.filter(col("s") === efg).count() == 2)
  }

  test("dedup-first expansion == raw intersection chain (unfiltered)") {
    val all = asSet(dedupFirst(lit(true)))
    val rawSet = asSet(raw)
    assert(all == rawSet)
    assert(rawSet.nonEmpty)
    // the intra-clique pairs of the 4-clone clique are present with
    // n_a = n_b = full shingle count and inter = surviving count
    assert(rawSet.exists { case (a, b, _, _, _) => a == 1L && b == 2L })
  }

  test("dedup-first expansion == raw chain under the Jaccard ≥ 0.8 gate") {
    val pred = col("inter") /
      (col("n_a") + col("n_b") - col("inter")) >= 0.8
    assert(asSet(dedupFirst(pred)) == asSet(raw.filter(pred)))
  }

  test("dedup-first expansion == raw chain under two-sided containment") {
    val pred = greatest(col("inter") / col("n_a"),
      col("inter") / col("n_b")) >= 0.9
    val got = asSet(dedupFirst(pred))
    assert(got == asSet(raw.filter(pred)))
    // doc 20 is contained in clique {1..4}: expansion must surface all
    // four raw pairs, not just the keeper's
    assert(Seq(1L, 2L, 3L, 4L).forall(a =>
      got.exists { case (x, y, _, _, _) => x == a && y == 20L }))
  }

  test("empty-token clones produce no pairs (no surviving shingles)") {
    val all = asSet(dedupFirst(lit(true)))
    assert(!all.exists { case (a, b, _, _, _) => a == 40L || b == 41L })
  }
}
