package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

/** Properties of the bounded-emission pair generators (the 100 TB
  * valve on d5/d17): the budget arm must be a LOUD, connectivity-
  * preserving subset of the unbounded form — never a silently
  * different pair list.
  */
class DedupBudgetSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val realDocs = spark.read
    .parquet(s"$sf001/documents.parquet").limit(400)
    .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))

  private lazy val realSims =
    DedupOps.simhash(realDocs, "doc_id", col("toks"))

  private lazy val realShingles = realDocs
    .select(col("doc_id"), DedupOps.shingleHashes(col("toks"), 3).as("sh"))

  // 6 identical docs: every chunk bucket is a 6-clique — the
  // adversarial duplicate-density case the budget exists for
  private lazy val cliqueDocs = (1L to 6L)
    .map(i => (i, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")
    .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))

  test("simhash budget arm is a subset; huge budget recovers the exact set") {
    val full = DedupOps.simhashPairs(realSims, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val budgeted = DedupOps
      .simhashPairsBudgeted(realSims, maxHamming = 3, perDocBudget = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(budgeted.map(t => (t._1, t._2, t._3)).toSet.subsetOf(full))
    // a budget wider than any bucket = the unbounded generator,
    // and every truncation counter reads 0
    val wide = DedupOps
      .simhashPairsBudgeted(realSims, maxHamming = 3, perDocBudget = 10000)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(wide.map(t => (t._1, t._2, t._3)).toSet == full)
    assert(wide.forall(t => t._4 == 0L && t._5 == 0L))
  }

  test("prefix budget arm is a subset; huge budget recovers the exact set") {
    val full = DedupOps
      .prefixFilterPairs(realShingles, "doc_id", "sh", 7, 10)
      .as[(Long, Long, Long, Double)].collect().toSet
    val budgeted = DedupOps
      .prefixFilterPairsBudgeted(realShingles, "doc_id", "sh", 7, 10,
        perDocBudget = 2)
      .as[(Long, Long, Long, Double, Long, Long)].collect()
    assert(budgeted.map(t => (t._1, t._2, t._3, t._4)).toSet.subsetOf(full))
    val wide = DedupOps
      .prefixFilterPairsBudgeted(realShingles, "doc_id", "sh", 7, 10,
        perDocBudget = 10000)
      .as[(Long, Long, Long, Double, Long, Long)].collect()
    assert(wide.map(t => (t._1, t._2, t._3, t._4)).toSet == full)
    assert(wide.forall(t => t._5 == 0L && t._6 == 0L))
  }

  test("B=1 on a clone clique: chain connectivity, loud truncation") {
    val sims = DedupOps.simhash(cliqueDocs, "doc_id", col("toks"))
    val pairs = DedupOps
      .simhashPairsBudgeted(sims, maxHamming = 3, perDocBudget = 1)
    val rows = pairs.as[(Long, Long, Long, Long, Long)].collect()
    // identical fingerprints sort by id in every bucket, so B=1 emits
    // exactly the 5 consecutive pairs — not the 15 of the 6-clique
    assert(rows.map(t => (t._1, t._2)).toSet ==
      (1L to 5L).map(i => (i, i + 1)).toSet)
    // the cut is loud: doc 1 heads every bucket and drops 4 successor
    // slots per chunk (6-1-1) × 4 chunks = 16 (no predecessors)
    val trunc1 = rows.filter(_._1 == 1L).map(_._4).head
    assert(trunc1 == 16L)
    // ADVICE r14 (the tail-doc case): pair (5,6) survives at B=1, and
    // BOTH endpoints must read nonzero — each is missing pairs to
    // truncated predecessors even though neither dropped a successor
    // there. Per chunk: doc 5 (0-based i=4) drops max(4-4,0) succ +
    // max(4-1,0) pred = 3; doc 6 (i=5) drops 0 + 4. × 4 chunks.
    val p56 = rows.find(t => t._1 == 5L && t._2 == 6L).get
    assert(p56._4 == 12L && p56._5 == 16L)
    // trunc = 0 ⟺ exhaustive: in a saturated clique at B=1, NO doc's
    // pair list is exhaustive, so no counter may read 0
    assert(rows.forall(t => t._4 > 0L && t._5 > 0L))
    // and the clique still clusters as ONE component downstream
    val comps = DedupOps
      .connectedComponents(pairs, "id_a", "id_b")
      .select(col("cluster")).distinct().as[Long].collect()
    assert(comps.toSeq == Seq(1L))
  }

  test("dedup-first pairing: clones collapse, keepers pair with lineage") {
    // 6 exact clones of A (ids 1-6) + one near-dup B (id 7, last of
    // 30 tokens differs: 28 shingles each, the final shingle diverges
    // -> 27 shared over a 29-shingle union)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val docs = ((1L to 6L).map(i => (i, base)) :+ (7L, near))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val rows = QueriesDedup.dedupFirstPairs(docs)
      .as[(Long, Long, Double, Long, Long)].collect()
    // exactly one pair: keeper 1 (representing 6 raw docs) vs 7
    assert(rows.toSeq == Seq((1L, 7L,
      BigDecimal(27.0 / 29.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, 6L, 1L)))
  }

  test("shared min-off frame filter == direct budgeted expansion") {
    // d29 now filters the persisted B=8 verified min-offset frame
    // (VERDICT r14 #2a) — pin that the filter reproduces the direct
    // B=2 expansion row-for-row, trunc counters included
    val (e, buckets) = graft.operators.DedupOps
      .prefixBuckets(realShingles, "doc_id", "sh", 7, 10, 1000L)
    val verified = DedupOps.prefixVerifiedMinOff(e, buckets, 7, 10, 8)
    val viaShared = DedupOps
      .prefixFilterPairsBudgetedFromVerified(verified, buckets, 2)
      .as[(Long, Long, Long, Double, Long, Long)].collect().toSet
    val direct = DedupOps
      .prefixFilterPairsBudgetedFrom(e, buckets, 7, 10, 2)
      .as[(Long, Long, Long, Double, Long, Long)].collect().toSet
    assert(viaShared == direct)
    assert(direct.nonEmpty)
  }

  test("prefix budget curve: monotone, consistent with the generator") {
    val curve = DedupOps
      .prefixBudgetCurve(realShingles, "doc_id", "sh", 7, 10,
        budgets = Seq(1, 2, 4, 8))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    assert(curve.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 >= b._3 && a._4 >= b._4 })
    val gen2 = DedupOps
      .prefixFilterPairsBudgeted(realShingles, "doc_id", "sh", 7, 10,
        perDocBudget = 2).count()
    assert(curve.find(_._1 == 2L).get._2 == gen2)
  }

  test("budget curve: monotone, exact at the wide end, prices the cut") {
    val curve = DedupOps
      .simhashBudgetCurve(realSims, maxHamming = 3, budgets = Seq(1, 2, 4, 8))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // pairs kept grow with budget; slots dropped and docs touched shrink
    assert(curve.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 >= b._3 && a._4 >= b._4 })
    // every pair the B=8 curve admits is a real verified pair
    val full = DedupOps.simhashPairs(realSims, maxHamming = 3).count()
    assert(curve.last._2 <= full)
    // consistency with the generator: pairs_kept at B=2 equals the
    // budgeted arm's distinct pair count
    val gen2 = DedupOps
      .simhashPairsBudgeted(realSims, maxHamming = 3, perDocBudget = 2)
      .count()
    assert(curve.find(_._1 == 2L).get._2 == gen2)
  }
}
