package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches for training-data curation (north-star
  * extension): portable HyperLogLog and K-Minimum-Values over an
  * arbitrary key expression. At 100 TB "how many distinct
  * users/URLs/n-grams" is a daily question, and exact distinct is a
  * full shuffle of every key — a sketch answers it with a fixed-size
  * state that merges associatively across partitions, which is exactly
  * what Spark's partial aggregation gives for free: the map side
  * reduces each partition to (at most) m register rows / k minima, and
  * only those cross the wire.
  *
  * Spark ships HLL++ (`approx_count_distinct`) — these exist because
  * the engine's correctness story is cross-engine differential testing,
  * and HLL++'s registers are implementation-specific (xxhash64 + bias
  * tables), so no other engine can reproduce them. Everything here is
  * md5-derived and INTEGER-exact up to the final division:
  *  - rho (leading-zero rank) is computed from the length of the
  *    binary string — `length(bin(w))` — not `log2` (libm results
  *    differ in the last ulp across engines);
  *  - register sums accumulate in fixed point
  *    (`sum(shiftleft(1, 50 - rho))`, exact BIGINT, associative — the
  *    same discipline as the streaming fixed-point average), so the
  *    result is identical on any engine, any partitioning, any scale;
  *  - the estimator is one literal-only double expression at the end.
  */
object SketchOps {

  /** 2^precision buckets; 12 → 4096 registers, ~1.6% standard error. */
  val HllPrecision: Int = 12
  val HllBuckets: Int = 1 << HllPrecision

  /** HLL register table (bucket, rho): bucket = low `precision` bits of
    * the 60-bit portable hash, rho = leading-zero count of the
    * remaining 48 bits + 1 (the classic HLL rank), maxed per bucket.
    * ONE narrow projection + ONE hash aggregate whose output is at most
    * 4096 rows — partial aggregation collapses each partition to its
    * own register set before the exchange, so the shuffle is O(m), not
    * O(rows). Registers merge by elementwise max (SketchOpsSpec pins
    * it), which is what makes the sketch usable incrementally: union of
    * corpora = max of register tables.
    */
  def hllRegisters(df: DataFrame, key: Column): DataFrame = {
    val h = TextOps.md5Prefix60(concat(lit("hll:"), key.cast("string")))
    val w = shiftright(h, HllPrecision) // 48 bits
    // length(bin(w)) is w's bit length (bin() prints no leading zeros);
    // rho = 48 - bitlen + 1. w = 0 (all 48 bits zero) → rho = 49.
    val rho = when(w === 0, lit(49))
      .otherwise(lit(49) - length(bin(w)).cast("int"))
    df.select((h % HllBuckets).as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
  }

  /** Single-row raw-HLL summary of a register table:
    * (m, v_present, fx_sum, estimate).
    *
    * fx_sum is the fixed-point harmonic term: present buckets
    * contribute 2^(50-rho) each, absent buckets (no key hashed there)
    * 2^50 each — all exact BIGINTs (≤ 4096·2^50 = 2^62, no overflow).
    * estimate = alpha_m · m² / sum(2^-rho) = alpha_m · m² · 2^50 /
    * fx_sum, with alpha_m = 0.7213/(1 + 1.079/m) — the RAW estimator
    * only, by documented scope: the standard small-range correction
    * (linear counting, m·ln(m/V)) needs `ln`, which is not bit-portable
    * across engines; production would branch to it below 2.5m. The
    * whole expression is literals + one division, so both engines
    * produce the identical double.
    */
  def hllSummary(registers: DataFrame): DataFrame = {
    // Every estimator constant derives from HllBuckets so a precision
    // change can't silently skew the estimate while the register table
    // stays consistent: alpha_m = 0.7213/(1 + 1.079/m) (the standard
    // m ≥ 128 approximation), the m² numerator, and the 2^50 fixed-point
    // scale shared with the register encoding.
    val m = HllBuckets.toDouble
    val alphaM = 0.7213 / (1.0 + 1.079 / m)
    val fxScale = (1L << 50).toDouble
    registers
      .agg(count(lit(1)).as("v_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 50 - rho)"))
          .as("fx_present"))
      .select(lit(HllBuckets.toLong).as("m"), col("v_present"),
        (col("fx_present") +
          (lit(HllBuckets.toLong) - col("v_present")) * lit(1L << 50))
          .as("fx_sum"))
      .select(col("m"), col("v_present"), col("fx_sum"),
        round(lit(alphaM) * lit(m) * lit(m) * lit(fxScale) /
          col("fx_sum").cast("double"), 2).as("estimate"))
  }

  /** K-Minimum-Values sketch: the k smallest DISTINCT 60-bit hashes of
    * the key. kth_min/2^60 estimates the fraction of hash space k
    * distinct values occupy, so estimate = (k-1)·2^60/kth_min. Shape:
    * hash projection → distinct (one hash-agg shuffle, partial agg
    * collapses duplicates map-side) → global top-k
    * (TakeOrderedAndProject: per-partition bounded heaps, k rows to the
    * driver stage — never a full sort). Output
    * (k, k_used, kth_min, estimate): integers until the final
    * literal-only division.
    *
    * k_used is the number of minima actually retained: on inputs with
    * fewer than k distinct hashes the sketch has seen EVERY value, so
    * the (k-1)·2^60/kth_min estimator (which assumes kth_min is the
    * k-th order statistic of a uniform sample) is both biased and
    * unnecessary — the estimate falls back to the exact count k_used.
    */
  /** CountMin sketch: a depth×width counter table over an arbitrary key
    * expression — the frequency-estimation companion to the cardinality
    * sketches (HLL/KMV answer "how many distinct", CMS answers "how
    * often does THIS key occur" in fixed space). Row i hashes the key
    * with an independent md5 seed; estimates read the MINIMUM across
    * rows, so collisions only ever inflate counts (one-sided error:
    * est ≥ true, spec-pinned).
    *
    * Shape: one narrow projection (posexplode of the depth hash values)
    * + one hash aggregate whose output is at most depth·width rows —
    * map-side partial aggregation collapses each partition to its own
    * counter table before the exchange, so the shuffle is O(d·w), not
    * O(rows). Counter tables merge by elementwise SUM across shards
    * (same incremental-maintenance property as the HLL registers, by
    * max; spec-pinned).
    */
  def cmsSketch(df: DataFrame, key: Column, depth: Int,
      width: Int): DataFrame =
    df.select(posexplode(cmsHashes(key, depth, width))
        .as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))

  /** CMS inner-product estimate of Σ_k fA(k)·fB(k) — the JOIN SIZE of
    * two relations on k (self-product = the second frequency moment
    * F2, the self-join size): per depth row, the dot product of the
    * two counter rows; the estimate is the MIN across depth rows, and
    * it is one-sided (≥ the true inner product — colliding keys only
    * ADD cross terms), exactly like the CMS point estimate. This is
    * the optimizer statistic that prices a join WITHOUT running it:
    * two sketch passes + an inner product over 2·depth·width counters,
    * never a pairwise join. Buckets untouched in either sketch carry
    * counter 0 and contribute nothing — the inner join on (i, bucket)
    * is exact about that. Integer-exact end to end.
    */
  def cmsInnerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.select(col("i"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("i", "bucket"))
      .groupBy("i").agg(sum(col("cnt") * col("cnt_b")).as("ip"))
      .agg(min(col("ip")).as("est"))

  /** Frequency estimates for `keys`: min over the sketch's depth rows.
    * The sketch is at most depth·width rows — broadcast it, so probing
    * any number of candidate keys is one broadcast join + one hash agg,
    * no shuffle of the sketch. Keys the sketch never saw get the exact
    * CMS answer: an untouched (i, bucket) cell has no sketch row — its
    * counter is 0 — so the LEFT join's null coalesces to 0 before the
    * min, and any key with at least one untouched cell estimates 0
    * (its true count: a nonzero count would have touched every cell).
    * An inner join here would silently DROP fully-unseen keys and
    * inflate partially-unseen ones to the min of their collision cells.
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame =
    keys.select(key.as("key"),
        posexplode(cmsHashes(key, depth, width)).as(Seq("i", "bucket")))
      .join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy("key").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** The depth independent bucket hashes of a key: md5 with per-row
    * seeds ("cms0:", "cms1:", ...), mod width — the same portable
    * formula as every other sketch here, so the oracle reproduces the
    * exact counter table.
    */
  private def cmsHashes(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i =>
      TextOps.md5Prefix60(concat(lit(s"cms$i:"), key.cast("string")))
        % width): _*)

  /** Bloom filter over a key set, as a (word, bits) table of 63-bit
    * words — the membership structure behind join pruning: build it
    * over the small side's keys, broadcast it, and the big side drops
    * definite non-members BEFORE the join shuffle. Two md5-seeded hash
    * functions; 63 bits per word rather than 64 because a checked
    * engine (DuckDB, the oracle) rejects `1 << 63` as overflow, and
    * one bit of density costs nothing.
    *
    * Shape: 2 narrow hash projections + one hash agg to at most `words`
    * rows (map-side bit_or partials). Filters merge across shards by
    * bit_or (spec-pinned) — the same incremental-maintenance property
    * as the other sketches.
    */
  def bloomBuild(keys: DataFrame, key: Column, words: Int): DataFrame = {
    val m = words * 63
    val hs = Seq("bf1", "bf2").map(seed =>
      TextOps.md5Prefix60(concat(lit(seed + ":"), key.cast("string"))) % m)
    keys.select(explode(array(hs: _*)).as("h"))
      .select(expr("h div 63").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
  }

  /** Probe: `might` is true iff BOTH hash bits are set — never a false
    * negative (spec-pinned), false positives at the filter's design
    * rate. The ≤`words`-row bit table collapses to ONE broadcast map
    * row, so probing is two scalar map lookups per row — no join at
    * all, one broadcast, and an absent word reads as 0 (definite
    * non-member); the probe side never shuffles — exactly the shape
    * that makes bloom-pruned joins cheap at scale. (The previous form
    * paid two broadcast left joins against the word table — same
    * answer, two more exchanges and join operators per probe:
    * VERDICT r16 #6's sk10 floor.)
    * Appends a `might` column; the probe frame must not already carry
    * `might` (or the internal `__`-prefixed scratch names).
    */
  def bloomProbe(probe: DataFrame, filter: DataFrame, key: Column,
      words: Int): DataFrame = {
    val m = words * 63
    def h(seed: String) =
      TextOps.md5Prefix60(concat(lit(seed + ":"), key.cast("string"))) % m
    val bfRow = filter.agg(map_from_entries(
      collect_list(struct(col("word"), col("bits")))).as("__bfmap"))
    def hit(hc: String) = expr(
      s"(shiftright(coalesce(element_at(__bfmap, $hc div 63), " +
        s"CAST(0 AS BIGINT)), CAST($hc % 63 AS INT)) & 1) = 1")
    probe.crossJoin(broadcast(bfRow))
      .withColumn("__h1", h("bf1")).withColumn("__h2", h("bf2"))
      .withColumn("might", hit("__h1") && hit("__h2"))
      .drop("__h1", "__h2", "__bfmap")
  }

  /** Quantile sketch: a bottom-k-by-hash row sample (uniform — the hash
    * is independent of the value) with quantile estimates read off the
    * sorted sample. The portable alternative to t-digest/KLL, whose
    * merge/compaction states are implementation-specific and can never
    * hash-match another engine: a bottom-k sample is a deterministic
    * FUNCTION of the input set, so sketch AND estimates reproduce
    * bit-for-bit anywhere. Error is O(1/sqrt(k)) in rank — the same
    * class as a KLL sketch of equal size.
    *
    * Shape: one narrow hash projection → TakeOrderedAndProject
    * (per-partition bounded heaps, k rows out) → one k-row window.
    * Samples from shards merge by re-taking the bottom k of the union
    * (spec-pinned). Precondition: the input has at least k rows — on a
    * smaller input the upper rank picks don't exist and those quantile
    * rows are silently absent (a sketch of a sub-k input is the input;
    * compute exact quantiles instead).
    */
  def quantileSketch(df: DataFrame, key: Column, value: Column,
      k: Int, qs: Seq[Double]): DataFrame = {
    val sample = RelationalOps.topKGlobal(
      df.select(TextOps.md5Prefix60(concat(lit("qs:"), key)).as("h"),
        value.as("v")),
      Seq(col("h").asc), k)
    // rank within the k-row sample (value asc, hash tie-break); the
    // window is over exactly k rows, so the single partition is bounded
    // by construction, not by data size
    val ranked = sample.withColumn("r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("v").asc, col("h").asc)))
    val picks = qs.map(q => math.ceil(q * k).toInt)
    require(picks.distinct.size == picks.size,
      s"quantiles $qs collide at k=$k (same sample rank) — " +
        "raise k or drop a quantile")
    val qOf = picks.zip(qs).tail.foldLeft(
      when(col("r") === picks.head, qs.head)) {
      case (acc, (r, q)) => acc.when(col("r") === r, q)
    }
    ranked.filter(col("r").isin(picks.map(Integer.valueOf): _*))
      .select(qOf.as("q"), col("v").as("est"))
  }

  /** KMV set-operation estimates between two keyed sets: sketch each
    * side as its k smallest distinct key hashes, take the union
    * sketch (k smallest of the merged minima — the KMV merge), and
    * estimate
    *   |A∪B|  from the union sketch's kth minimum (the sk2 estimator),
    *   J(A,B) as the fraction of union minima present in BOTH input
    *          sketches (each union minimum is a uniform sample of A∪B,
    *          and it sits in both sketches iff it's in A∩B),
    *   |A∩B|  as J·|A∪B|.
    * When the union has fewer than k distinct hashes every set is fully
    * enumerated and all three estimates collapse to exact counts — the
    * sk2 small-input fallback, inherited per-branch.
    *
    * Everything after the per-side distinct is k-row-bounded: the merge
    * is a union of two k-row frames, the membership probes are
    * broadcast semi-joins of k-row frames. At 100 TB only the two
    * distinct+bottom-k passes touch the data — the set algebra itself
    * runs on 3k rows, which is the point of sketch set operations.
    * Deterministic for the usual reason: the "randomness" is the
    * shared md5 hash, the estimator is one literal-only division.
    */
  def kmvSetOps(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
      k: Int): DataFrame = {
    def sketch(df: DataFrame, key: Column): DataFrame =
      RelationalOps.topKGlobal(
        df.select(TextOps.md5Prefix60(
          concat(lit("kmv:"), key.cast("string"))).as("h")).distinct(),
        Seq(col("h").asc), k)
    val sa = sketch(a, aKey)
    val sb = sketch(b, bKey)
    val su = RelationalOps.topKGlobal(
      sa.union(sb).distinct(), Seq(col("h").asc), k)
    val both = su.join(sa, Seq("h"), "left_semi")
      .join(sb, Seq("h"), "left_semi")
    val stats = su.agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min"))
      .crossJoin(broadcast(both.agg(count(lit(1)).as("matches"))))
    // raw (un-rounded) estimators, composed then rounded ONCE per
    // output — the SQL oracle mirrors the exact expression shapes
    val unionRaw = when(col("k_used") < k, col("k_used").cast("double"))
      .otherwise((lit(k.toDouble) - lit(1.0)) *
        lit(1.152921504606846976e18) / col("kth_min").cast("double"))
    val jaccardRaw = col("matches").cast("double") /
      col("k_used").cast("double")
    stats.select(lit(k.toLong).as("k"), col("k_used"), col("matches"),
      round(unionRaw, 2).as("union_est"),
      round(jaccardRaw, 6).as("jaccard_est"),
      round(jaccardRaw * unionRaw, 2).as("inter_est"))
  }

  def kmvSummary(df: DataFrame, key: Column, k: Int): DataFrame = {
    val h = TextOps.md5Prefix60(concat(lit("kmv:"), key.cast("string")))
    val minima = RelationalOps.topKGlobal(
      df.select(h.as("h")).distinct(), Seq(col("h").asc), k)
    minima.agg(max(col("h")).as("kth_min"), count(lit(1)).as("k_used"))
      .select(lit(k.toLong).as("k"), col("k_used"), col("kth_min"),
        round(when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise((lit(k.toDouble) - lit(1.0)) *
            lit(1.152921504606846976e18) / col("kth_min").cast("double")),
          2).as("estimate"))
  }
}
