package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

class SketchOpsSpec extends SparkTestBase {
  import spark.implicits._

  // 10k distinct keys, each appearing 1-3 times (duplicates must not
  // move either sketch)
  private lazy val keys = (1L to 10000L)
    .flatMap(i => Seq.fill((i % 3 + 1).toInt)(i)).toDF("k")

  test("hll estimate lands within 5% of the truth at 10k distinct") {
    val est = SketchOps.hllSummary(SketchOps.hllRegisters(keys, col("k")))
      .select("estimate").as[Double].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.05,
      s"raw HLL estimate $est too far from 10000")
  }

  test("hll registers are duplicate-insensitive and merge by max") {
    val a = (1L to 5000L).toDF("k")
    val b = (4000L to 10000L).toDF("k")
    val union = SketchOps.hllRegisters(a.union(b), col("k"))
    // merging = elementwise max over the two register tables (absent
    // bucket = no contribution) — the property that makes the sketch
    // incrementally maintainable across corpus shards
    val merged = SketchOps.hllRegisters(a, col("k"))
      .union(SketchOps.hllRegisters(b, col("k")))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
    assert(merged.exceptAll(union).isEmpty && union.exceptAll(merged).isEmpty)
    // duplicates change nothing
    val dup = SketchOps.hllRegisters(a.union(a), col("k"))
    val plain = SketchOps.hllRegisters(a, col("k"))
    assert(dup.exceptAll(plain).isEmpty && plain.exceptAll(dup).isEmpty)
  }

  test("hll summary is exact integers + one deterministic double") {
    val s1 = SketchOps.hllSummary(SketchOps.hllRegisters(keys, col("k")))
      .collect()(0)
    val s2 = SketchOps.hllSummary(
      SketchOps.hllRegisters(keys.repartition(7), col("k"))).collect()(0)
    assert(s1 == s2, "summary must not depend on partitioning")
    assert(s1.getLong(0) == 4096L)
  }

  test("kmv estimate lands within 10% of the truth at 10k distinct") {
    val row = SketchOps.kmvSummary(keys, col("k"), 256).collect()(0)
    assert(row.getLong(0) == 256L)
    assert(row.getLong(1) == 256L, "k_used must equal k on large inputs")
    val est = row.getDouble(3)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.10,
      s"KMV estimate $est too far from 10000")
  }

  test("kmv is EXACT when the input has fewer distinct keys than k") {
    // with < k distinct hashes the sketch retained every value; the
    // order-statistic estimator would be biased, so the summary must
    // report the true count via k_used and use it as the estimate
    val row = SketchOps.kmvSummary(
      (1L to 100L).flatMap(i => Seq(i, i)).toDF("k"), col("k"), 256)
      .collect()(0)
    assert(row.getLong(0) == 256L)
    assert(row.getLong(1) == 100L, "k_used must be the true distinct count")
    assert(row.getDouble(3) == 100.0, "estimate must fall back to exact")
  }

  test("hll registers maintain incrementally over a stream") {
    // the merge-by-max property in its natural habitat: a streaming
    // groupBy(bucket).max(rho) in complete mode converges to exactly
    // the batch register table no matter how the input is batched
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = SketchOps.hllRegisters(ms.toDF().toDF("k"), col("k"))
      .writeStream.format("memory").queryName("hll_t")
      .outputMode("complete").start()
    try {
      ms.addData(1L to 5000L: _*)
      q.processAllAvailable()
      ms.addData(3000L to 8000L: _*) // overlap: max must win, not sum
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_t")
    val batch = SketchOps.hllRegisters((1L to 8000L).toDF("k"), col("k"))
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed register table must equal the batch register table")
  }

  test("cms estimates are one-sided: est >= true count, exact when clean") {
    // 200 keys, key i occurring (i % 5 + 1) times
    val df = (1L to 200L).flatMap(i => Seq.fill((i % 5 + 1).toInt)(i))
      .toDF("k")
    val sketch = SketchOps.cmsSketch(df, col("k"), 4, 1024)
    val est = SketchOps.cmsEstimate(sketch,
      (1L to 200L).toDF("k"), col("k"), 4, 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 200L).foreach { i =>
      val truth = i % 5 + 1
      assert(est(i) >= truth, s"CMS must never undercount (key $i)")
    }
    // 200 keys into 4x1024 buckets: the min-row is almost surely clean;
    // allow a tiny inflation margin rather than assuming zero collisions
    assert((1L to 200L).count(i => est(i) == i % 5 + 1) >= 190,
      "nearly all estimates should be exact at this load factor")
  }

  test("cms estimates fully-unseen keys as 0 (untouched cells coalesce)") {
    // keys 1..10 inserted; probes 1000001..1000010 never inserted. With
    // 40 touched cells out of 4x1024, each probe hits at least one
    // untouched (i, bucket) cell (deterministic md5 layout), so the
    // LEFT join's null coalesces to 0 and the min gives the exact
    // answer 0. The previous inner-join formulation silently DROPPED
    // fully-unseen keys from the output and inflated partially-unseen
    // ones to the min of their collision cells.
    val sketch = SketchOps.cmsSketch((1L to 10L).toDF("k"), col("k"),
      4, 1024)
    val est = SketchOps.cmsEstimate(sketch,
      (1000001L to 1000010L).toDF("k"), col("k"), 4, 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == (1000001L to 1000010L).toSet,
      "every probed key must appear in the output")
    assert(est.values.forall(_ == 0L),
      s"unseen keys must estimate 0, got $est")
  }

  test("cms counters maintain incrementally over a stream") {
    // sum-merge in its natural habitat: a streaming groupBy(i, bucket)
    // count in complete mode equals the batch counter table no matter
    // how the input is batched — duplicates across batches must ADD
    // (unlike HLL's max-merge)
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = SketchOps.cmsSketch(ms.toDF().toDF("k"), col("k"), 4, 256)
      .writeStream.format("memory").queryName("cms_t")
      .outputMode("complete").start()
    try {
      ms.addData(1L to 400L: _*)
      q.processAllAvailable()
      ms.addData(200L to 600L: _*) // overlap: counts must sum
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_t")
    val batch = SketchOps.cmsSketch(
      ((1L to 400L) ++ (200L to 600L)).toDF("k"), col("k"), 4, 256)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed counter table must equal the batch counter table")
  }

  test("cms counter tables merge by elementwise sum across shards") {
    val a = (1L to 300L).toDF("k")
    val b = (200L to 500L).toDF("k") // overlap: sums must add, not max
    val union = SketchOps.cmsSketch(a.union(b), col("k"), 4, 256)
    val merged = SketchOps.cmsSketch(a, col("k"), 4, 256)
      .union(SketchOps.cmsSketch(b, col("k"), 4, 256))
      .groupBy("i", "bucket").agg(sum(col("cnt")).as("cnt"))
    assert(merged.exceptAll(union).isEmpty &&
      union.exceptAll(merged).isEmpty,
      "merged shard sketches must equal the whole-corpus sketch")
  }

  test("bloom filter has NO false negatives; filters merge by bit_or") {
    val keys = (1L to 500L).filter(_ % 3 == 0).toDF("k")
    val bf = SketchOps.bloomBuild(keys, col("k"), 64)
    val probed = SketchOps.bloomProbe((1L to 1000L).toDF("k"), bf,
      col("k"), 64)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (1L to 500L).filter(_ % 3 == 0).foreach { k =>
      assert(probed(k), s"member $k must pass — bloom never false-negs")
    }
    // false positives exist but stay well under the non-member count
    val fps = (1L to 1000L).filter(k => k % 3 != 0 || k > 500)
      .count(probed(_))
    assert(fps < 300, s"false-positive rate implausibly high ($fps)")
    // shard merge: bit_or of per-shard filters == whole-set filter
    val a = (1L to 200L).toDF("k")
    val b = (150L to 400L).toDF("k")
    val union = SketchOps.bloomBuild(a.union(b), col("k"), 64)
    val merged = SketchOps.bloomBuild(a, col("k"), 64)
      .union(SketchOps.bloomBuild(b, col("k"), 64))
      .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
    assert(merged.exceptAll(union).isEmpty &&
      union.exceptAll(merged).isEmpty)
  }

  test("quantile sketch lands near true quantiles and is partition-stable") {
    // uniform 1..20000: true q-quantile = 20000q; bottom-256 sample
    // estimates should land within ~3/sqrt(256) of the true rank
    val df = (1L to 20000L).toDF("k")
      .select(col("k"), col("k").cast("double").as("v"))
    val est = SketchOps.quantileSketch(df, col("k").cast("string"),
      col("v"), 256, Seq(0.25, 0.5, 0.75, 0.95))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for ((q, e) <- est)
      assert(math.abs(e / 20000.0 - q) < 0.2,
        s"q=$q estimate $e too far from ${20000 * q}")
    // determinism: repartitioning must not change a single estimate
    val est2 = SketchOps.quantileSketch(df.repartition(13),
      col("k").cast("string"), col("v"), 256, Seq(0.25, 0.5, 0.75, 0.95))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(est == est2, "sketch must be a pure function of the input set")
  }

  test("native hll aggregate == relational hll estimate, any partitioning") {
    import org.apache.spark.sql.graft.SketchAggregates
    val seeded = concat(lit("hll:"), col("k").cast("string"))
    val relational = SketchOps.hllSummary(
      SketchOps.hllRegisters(keys, col("k")))
      .select("estimate").as[Double].head()
    val native = keys.agg(
      round(SketchAggregates.hllEstimate(seeded), 2)).as[Double].head()
    assert(native == relational,
      "the custom aggregate must reproduce the relational estimator " +
        "bit-for-bit")
    val repart = keys.repartition(17).agg(
      round(SketchAggregates.hllEstimate(seeded), 2)).as[Double].head()
    assert(repart == native, "partial/merge must be partition-invariant")
    // zero rows -> null, same as the relational form (never the raw
    // estimator's alpha*m phantom)
    val empty = keys.filter(col("k") < 0).agg(
      SketchAggregates.hllEstimate(seeded)).collect()(0)
    assert(empty.isNullAt(0), "empty input must estimate null")
  }

  test("native hll aggregate groups independently (per-group sketches)") {
    import org.apache.spark.sql.graft.SketchAggregates
    // two groups with disjoint key ranges of different sizes: the
    // grouped aggregate must equal the relational estimator computed
    // over each group's rows ALONE — cross-group register bleed would
    // skew both
    val df = (1L to 3000L).map(i => (if (i <= 1000) "a" else "b", i))
      .toDF("g", "k")
    val grouped = df.groupBy("g")
      .agg(round(SketchAggregates.hllEstimate(
        concat(lit("hll:"), col("k").cast("string"))), 2).as("est"))
      .as[(String, Double)].collect().toMap
    for (g <- Seq("a", "b")) {
      val expected = SketchOps.hllSummary(
        SketchOps.hllRegisters(df.filter(col("g") === g), col("k")))
        .select("estimate").as[Double].head()
      assert(grouped(g) == expected,
        s"group $g: grouped native ${grouped(g)} != relational $expected")
    }
  }

  test("kmv set ops collapse to exact counts under k distinct") {
    val a = (1L to 10L).toDF("k")
    val b = (6L to 15L).toDF("k")
    val r = SketchOps.kmvSetOps(a, col("k"), b, col("k"), k = 16)
      .collect()(0)
    // union=15 < k: fully enumerated -> every output is exact
    assert(r.getAs[Long]("k_used") == 15L)
    assert(r.getAs[Long]("matches") == 5L)
    assert(r.getAs[Double]("union_est") == 15.0)
    assert(r.getAs[Double]("jaccard_est") == 0.333333)
    assert(r.getAs[Double]("inter_est") == 5.0)
  }

  test("kmv set ops estimate within tolerance in sketch mode") {
    // |A|=2000, |B|=2000, inter=1000, union=3000, J=1/3
    val a = (1L to 2000L).toDF("k")
    val b = (1001L to 3000L).toDF("k")
    val r = SketchOps.kmvSetOps(a, col("k"), b, col("k"), k = 256)
      .collect()(0)
    val u = r.getAs[Double]("union_est")
    val j = r.getAs[Double]("jaccard_est")
    val i = r.getAs[Double]("inter_est")
    assert(math.abs(u - 3000) / 3000.0 < 0.15, s"union_est=$u")
    assert(math.abs(j - 1.0 / 3) < 0.1, s"jaccard_est=$j")
    assert(math.abs(i - 1000) / 1000.0 < 0.25, s"inter_est=$i")
  }

  test("cms inner product is one-sided and exact without collisions") {
    import spark.implicits._
    // f = {a:3, b:2, c:1} -> F2 = 9+4+1 = 14
    val df = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k")
    def f2(width: Int): Long = {
      val sk = SketchOps.cmsSketch(df, col("k"), 4, width)
      SketchOps.cmsInnerProduct(sk, sk).as[Long].head()
    }
    // wide sketch: 3 keys in 1024 buckets never collide -> exact
    assert(f2(1024) == 14L)
    // width 1 forces every key into one bucket: (3+2+1)^2 = 36 >= 14,
    // the one-sided bound at its worst
    assert(f2(1) == 36L)
    // cross product prices a join: f_b = {a:1, b:1} -> Σ fA·fB = 3+2 = 5
    val skA = SketchOps.cmsSketch(df, col("k"), 4, 1024)
    val skB = SketchOps.cmsSketch(Seq("a", "b").toDF("k"), col("k"), 4, 1024)
    assert(SketchOps.cmsInnerProduct(skA, skB).as[Long].head() == 5L)
  }

  test("native kmv aggregate == relational kmv estimate, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.graft.SketchAggregates
    for (parts <- Seq(1, 7)) {
      val df = (1L to 3000L).toDF("k").repartition(parts)
      val native = df.agg(round(SketchAggregates.kmvEstimate(
          concat(lit("kmv:"), col("k").cast("string")), 64), 2).as("est"))
        .as[Double].head()
      val relational = SketchOps.kmvSummary(df, col("k"), 64)
        .select("estimate").as[Double].head()
      assert(native == relational,
        s"parts=$parts: native $native != relational $relational")
    }
  }

  test("native kmv aggregate is exact under k and 0.0 on empty input") {
    import spark.implicits._
    import org.apache.spark.sql.graft.SketchAggregates
    def est(df: org.apache.spark.sql.DataFrame, k: Int): Double =
      df.agg(SketchAggregates.kmvEstimate(
        concat(lit("kmv:"), col("k").cast("string")), k).as("e"))
        .as[Double].head()
    // 40 distinct under k=64, duplicated rows -> exactly 40.0
    assert(est((1L to 40L).flatMap(i => Seq(i, i)).toDF("k"), 64) == 40.0)
    // all-null input -> zero distinct, exactly
    assert(est(Seq[Option[Long]](None, None).toDF("k"), 64) == 0.0)
  }

  test("kmv is duplicate-insensitive") {
    val once = SketchOps.kmvSummary((1L to 3000L).toDF("k"), col("k"), 64)
      .collect()(0)
    val dup = SketchOps.kmvSummary(
      (1L to 3000L).flatMap(i => Seq(i, i)).toDF("k"), col("k"), 64)
      .collect()(0)
    assert(once == dup)
  }

  test("sk11 accuracy gate: estimator errors stay inside their bounds") {
    // HLL m=4096 has ~1.6% standard error, KMV k=256 ~6%; the floors
    // (5% / 15%, ~3 sigma) exist so a precision retune that collapses
    // accuracy fails here — the estimators' own oracles replicate the
    // math and stay green under ANY m/k
    val r = SparkEntry.queries("sk11_sketch_error")(spark, sf001)
      .collect()(0)
    val (hllBps, kmvBps) = (r.getLong(3), r.getLong(4))
    assert(hllBps < 500, s"HLL error $hllBps bps exceeds 5%")
    assert(kmvBps < 1500, s"KMV error $kmvBps bps exceeds 15%")
  }
}
