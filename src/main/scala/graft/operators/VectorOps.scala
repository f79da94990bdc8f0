package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity-search operators over embedding columns
  * (`ArrayType(FloatType)`) — north-star extension, SURVEY.md §2.10.
  *
  * Numeric determinism: embeddings are widened float→double BEFORE any
  * arithmetic, and every reduction is an explicit left-to-right fold
  * (`aggregate` with a 0.0 seed). IEEE-754 double addition in a fixed
  * order is bit-reproducible across engines — which is what lets the
  * DuckDB oracle hash-match cosine scores exactly (its side folds in the
  * same order). Never rely on an engine's built-in dot product for
  * verified output: its accumulation order/width is unspecified.
  *
  * Scale design:
  *  - Brute-force top-k: the probe set is broadcast (it is small by
  *    definition); each executor scans its corpus partition once and the
  *    per-group top-k is a window over (probe, score) — no cross-join
  *    shuffle of the corpus.
  *  - Hyperplane LSH: each vector maps to small band-bucket ids in one
  *    projection; probe vs corpus becomes an equi-join on (band,
  *    bucket). Recall 1-(1-p^rowsPerBand)^bands is tunable up with
  *    bands, cost O(q · bands · bucketSize) down with rowsPerBand —
  *    and MEASURED, not assumed: v8_ann_recall grades the candidates
  *    against the exact top-10 and VectorOpsSpec floors the result.
  *  - IVF-style routing: assign each vector to its nearest centroid
  *    (broadcast centroid table), search only matching cells.
  */
object VectorOps {

  /** float[] → double[] widening (exact). */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Strict left-fold dot product — deterministic accumulation order.
    * Backed by the native codegen'd [[org.apache.spark.sql.graft.DotProductDouble]];
    * bit-identical to the HOF fold below (VectorOpsSpec asserts it).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.dotProduct(a, b)

  /** Reference HOF formulation of [[dot]] — interpreted, kept as the
    * executable spec of the fold semantics.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm via the same fold. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity given precomputed squared norms (precompute them
    * once per row BEFORE any pair join — never inside it).
    */
  def cosineFromParts(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / sqrt(n2a * n2b)

  /** Corpus with widened vector + precomputed squared norm. Spread across
    * full parallelism first: a small parquet file is one split, and a
    * single-partition corpus turns every pair scan downstream into a
    * one-core job (see DedupOps.spread).
    */
  def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    DedupOps.spread(df)
      .select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("n2", norm2(col("v")))

  /** Brute-force cosine top-k: every probe row against the full corpus.
    * `probes` must be small — it is broadcast so the corpus never
    * shuffles; the per-probe top-k is a window (no global sort).
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val joined = corpus.toDF("id_n", "v_n", "n2_n")
      .crossJoin(broadcast(probes.toDF("id_q", "v_q", "n2_q")))
      .filter(col("id_q") =!= col("id_n"))
      .withColumn("cos", cosineFromParts(dot(col("v_q"), col("v_n")),
        col("n2_q"), col("n2_n")))
      .select(col("id_q"), col("id_n"), round(col("cos"), 6).as("cos"))
    RelationalOps.topKPerGroup(joined, Seq("id_q"),
      Seq(col("cos").desc, col("id_n").asc), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): the
    * md5-derived 60-bit hash of "hp<plane>:<dim>" scaled by 2^59. Computed
    * driver-side (it is a constant per (plane, dim) — recomputing md5 per
    * vector row would dominate the bucket projection) but from a formula
    * any engine reproduces in SQL, which is how the oracle checks it.
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp$plane:$dim".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59).toDouble - 1.0
  }

  /** Sign-of-projection bucket id of band `band` over `rowsPerBand`
    * hyperplanes (global plane indices `band*rowsPerBand ..`): bit j is
    * set when v · plane_j >= 0. Planes are literal arrays; a bucket id
    * is one narrow projection. The projections use the native codegen'd
    * [[dot]] (bit-identical to the HOF fold, so the oracle's
    * `list_reduce` buckets agree).
    */
  def bandedBucket(v: Column, band: Int, rowsPerBand: Int,
      dim: Int): Column =
    (0 until rowsPerBand).map { j =>
      val plane = array((0 until dim)
        .map(i => lit(planeComponent(band * rowsPerBand + j, i))): _*)
      when(dot(v, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding near-dup pairs at scale: banded random-projection LSH
    * (`bands` OR-amplified bands of `rowsPerBand` sign bits — candidates
    * share at least one full band), verified by exact cosine.
    *
    * This is the scale path of the brute all-pairs near-dup (d6): shape
    * mirrors the shingle/simhash candidate generators — posting lists
    * per (band, bucket) with a frequency cap, in-row pair expansion, NO
    * self-join (one computation of the bucketed corpus, no O(n²) stage;
    * the cap bounds both the pair fan-out and the collect_list group
    * size). The same pair surviving several bands is collapsed by the
    * final distinct (cosine is deterministic, so the duplicates are
    * value-identical).
    */
  def lshNearDupPairs(corpus: DataFrame, bands: Int, rowsPerBand: Int,
      dim: Int, threshold: Double,
      maxBucketFreq: Long = 10000L): DataFrame = {
    val bandStructs = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        bandedBucket(col("v"), b, rowsPerBand, dim).as("bucket"))): _*)
    val banded = corpus.toDF("id", "v", "n2")
      .select(col("id"), col("v"), col("n2"),
        explode(bandStructs).as("bb"))
      .select(col("id"), col("v"), col("n2"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val postings = banded.groupBy("band", "bucket")
      .agg(collect_list(struct(col("id"), col("v"), col("n2"))).as("ds"))
      .filter(size(col("ds")) <= maxBucketFreq)
      .select(array_sort(col("ds")).as("ds"))
    postings
      .select(col("ds"), explode(col("ds")).as("a"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("cos", cosineFromParts(dot(col("a.v"), col("b.v")),
        col("a.n2"), col("b.n2")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos"), 6).as("cos"))
      .distinct()
  }

  /** ANN via OR-amplified banded bucket equality: a corpus vector is a
    * candidate for a probe when ANY of the `bands` band buckets
    * (`rowsPerBand` sign bits each) matches, then exact top-k over the
    * deduped candidates. The single-bucket formulation this replaces
    * (one AND over nPlanes sign bits) is high-precision/low-recall by
    * construction — on weakly-similar neighbors (cos ≈ 0.3, the top-10
    * regime of random-ish embeddings) its match probability is
    * p^nPlanes ≈ 1%, and the v8 recall gate measured it at ~0/10.
    * OR-amplification is the standard fix: recall 1-(1-p^r)^b is
    * tunable upward with more bands, cost (≈ bands·n/2^r candidate
    * comparisons per probe) downward with more rows per band —
    * v8_ann_recall measures the operating point and VectorOpsSpec
    * floors it. Shape: the corpus explodes ×bands (narrow), probes
    * broadcast (×bands rows), one equi-join on (band, bucket), distinct
    * on the deterministic (id, id, cos) triple — the corpus never
    * shuffles.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, bands: Int,
      rowsPerBand: Int, dim: Int, k: Int): DataFrame = {
    def banded(df: DataFrame, idc: String, vc: String, n2c: String) = {
      val bandStructs = array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          bandedBucket(col(vc), b, rowsPerBand, dim).as("bucket"))): _*)
      df.select(col(idc), col(vc), col(n2c), explode(bandStructs).as("bb"))
        .select(col(idc), col(vc), col(n2c),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val cb = banded(corpus.toDF("id_n", "v_n", "n2_n"), "id_n", "v_n", "n2_n")
    val pb = banded(probes.toDF("id_q", "v_q", "n2_q"), "id_q", "v_q", "n2_q")
    val joined = cb.join(broadcast(pb), Seq("band", "bucket"))
      .filter(col("id_q") =!= col("id_n"))
      .withColumn("cos", cosineFromParts(dot(col("v_q"), col("v_n")),
        col("n2_q"), col("n2_n")))
      .select(col("id_q"), col("id_n"), round(col("cos"), 6).as("cos"))
      .distinct()
    RelationalOps.topKPerGroup(joined, Seq("id_q"),
      Seq(col("cos").desc, col("id_n").asc), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Exact maximum-inner-product top-k (MIPS): rank by the RAW dot
    * product, not cosine — the retrieval objective when magnitudes
    * carry meaning (recommender scores, unnormalized rerankers).
    * Same broadcast shape as [[bruteForceTopK]].
    */
  def mipsTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val joined = corpus.toDF("id_n", "v_n", "n2_n")
      .crossJoin(broadcast(probes.toDF("id_q", "v_q", "n2_q")))
      .filter(col("id_q") =!= col("id_n"))
      .select(col("id_q"), col("id_n"),
        round(dot(col("v_q"), col("v_n")), 6).as("dot"))
    RelationalOps.topKPerGroup(joined, Seq("id_q"),
      Seq(col("dot").desc, col("id_n").asc), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Approximate MIPS via the norm-augmentation reduction to cosine
    * LSH (Shrivastava–Li style, simplified): append sqrt(M² − ‖x‖²)
    * to every corpus vector (M² = the corpus max squared norm — a
    * broadcast 1-row aggregate) and 0 to every probe. All augmented
    * corpus vectors then share norm M, so cosine in the augmented
    * space is q·x / (‖q‖·M) — MONOTONE in the inner product per
    * probe — and the existing hyperplane bands bucket by it.
    * Candidates come from the augmented-space band join; the final
    * scores rerank candidates by the EXACT dot of the ORIGINAL
    * vectors (asymmetric rerank — the standard shape). The corpus is
    * banded once, never shuffled; probes broadcast.
    */
  def mipsLshTopK(corpus: DataFrame, probes: DataFrame, bands: Int,
      rowsPerBand: Int, dim: Int, k: Int): DataFrame = {
    val m2 = corpus.agg(max(col("n2")).as("m2"))
    // greatest(·, 0): the max-norm row's residual is a float-negative
    // zero away from exact 0, and sqrt must not see it
    val caug = corpus.toDF("id_n", "v_n", "n2_n")
      .crossJoin(broadcast(m2))
      .select(col("id_n"), col("v_n"),
        concat(col("v_n"),
          array(sqrt(greatest(col("m2") - col("n2_n"), lit(0.0)))))
          .as("va"))
    val paug = probes.toDF("id_q", "v_q", "n2_q")
      .select(col("id_q"), col("v_q"),
        concat(col("v_q"), array(lit(0.0))).as("va"))
    def banded(df: DataFrame, idc: String, vc: String) = {
      val bandStructs = array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          bandedBucket(col("va"), b, rowsPerBand, dim + 1)
            .as("bucket"))): _*)
      df.select(col(idc), col(vc), explode(bandStructs).as("bb"))
        .select(col(idc), col(vc),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val joined = banded(caug, "id_n", "v_n")
      .join(broadcast(banded(paug, "id_q", "v_q")), Seq("band", "bucket"))
      .filter(col("id_q") =!= col("id_n"))
      .select(col("id_q"), col("id_n"),
        round(dot(col("v_q"), col("v_n")), 6).as("dot"))
      .distinct()
    RelationalOps.topKPerGroup(joined, Seq("id_q"),
      Seq(col("dot").desc, col("id_n").asc), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Route each vector to its `nProbe` nearest centroids by cosine
    * (centroids broadcast; one narrow pass + a window). `nProbe = 1` is
    * cell assignment; `nProbe > 1` is the probe-side fan-out that buys
    * IVF recall back at the cell boundaries.
    */
  def routeToCentroids(vectors: DataFrame, centroids: DataFrame,
      nProbe: Int, keepPayload: Boolean = false): DataFrame = {
    // The K centroids collapse to ONE broadcast array row; the top-nProbe
    // cells per vector are a narrow array computation — array_sort over
    // (negated cos, centroid_id) structs IS the (cos desc, id asc)
    // ranking — so routing never shuffles the vectors. The previous
    // window formulation re-shuffled every routed corpus vector on id.
    val centsRow = centroids.toDF("centroid_id", "v_c", "n2_c")
      .agg(array_sort(collect_list(
        struct(col("centroid_id"), col("v_c"), col("n2_c")))).as("cents"))
    val top = slice(array_sort(transform(col("cents"), s =>
      struct((-cosineFromParts(dot(col("v"), s.getField("v_c")),
        col("n2"), s.getField("n2_c"))).as("negcos"),
        s.getField("centroid_id").as("centroid_id")))), 1, nProbe)
    val routed = vectors.toDF("id", "v", "n2")
      .crossJoin(broadcast(centsRow))
      .select(col("id"), col("v"), col("n2"),
        explode(top).as("r"))
    // keepPayload carries (v, n2) through the routing so callers don't
    // have to re-join the source on id to get the vectors back — that
    // join re-scans the source and adds a shuffle for nothing
    if (keepPayload)
      routed.select(col("id"), col("r.centroid_id").as("centroid_id"),
        col("v"), col("n2"))
    else routed.select(col("id"), col("r.centroid_id").as("centroid_id"))
  }

  /** [[routeToCentroids]] with the route RANK attached (1 = nearest
    * cell): lets a multi-nProbe consumer (v19's operating curve) route
    * ONCE at the largest nProbe and treat each smaller arm as a
    * `rk <= np` filter over the same frame, instead of re-routing and
    * re-joining per arm. Same broadcast-centroid narrow shape.
    */
  def routeToCentroidsRanked(vectors: DataFrame, centroids: DataFrame,
      nProbe: Int): DataFrame = {
    val centsRow = centroids.toDF("centroid_id", "v_c", "n2_c")
      .agg(array_sort(collect_list(
        struct(col("centroid_id"), col("v_c"), col("n2_c")))).as("cents"))
    val top = slice(array_sort(transform(col("cents"), s =>
      struct((-cosineFromParts(dot(col("v"), s.getField("v_c")),
        col("n2"), s.getField("n2_c"))).as("negcos"),
        s.getField("centroid_id").as("centroid_id")))), 1, nProbe)
    vectors.toDF("id", "v", "n2")
      .crossJoin(broadcast(centsRow))
      .select(col("id"), col("v"), col("n2"),
        posexplode(top).as(Seq("pos", "r")))
      .select(col("id"), col("r.centroid_id").as("centroid_id"),
        (col("pos") + 1).cast("long").as("rk"), col("v"), col("n2"))
  }

  /** Full IVF ANN search: assign the corpus to cells (top-1 centroid),
    * route each probe to its `nProbe` nearest cells, then compare probes
    * only against the corpus vectors of their routed cells (equi-join on
    * the cell id) and take the exact top-k of the survivors.
    *
    * Scale shape: centroids broadcast twice (routing passes), probes
    * broadcast into the cell join; the corpus is scanned ONCE — the
    * routing windows carry the vectors through (`keepPayload`), so
    * neither side re-joins its own source to recover them. Never
    * self-joined, never shuffled by pair. Cost per probe is
    * O(nProbe × cellSize) instead of O(n); each corpus vector lives in
    * exactly one cell, so no dedup step is needed.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
      nProbe: Int, k: Int): DataFrame = {
    val corpusCells = routeToCentroids(corpus, centroids, 1,
      keepPayload = true).toDF("id_n", "centroid_id", "v_n", "n2_n")
    val probeCells = routeToCentroids(probes, centroids, nProbe,
      keepPayload = true).toDF("id_q", "centroid_id", "v_q", "n2_q")
    val joined = corpusCells.join(broadcast(probeCells), Seq("centroid_id"))
      .filter(col("id_q") =!= col("id_n"))
      .withColumn("cos", cosineFromParts(dot(col("v_q"), col("v_n")),
        col("n2_q"), col("n2_n")))
      .select(col("id_q"), col("id_n"), round(col("cos"), 6).as("cos"))
    RelationalOps.topKPerGroup(joined, Seq("id_q"),
      Seq(col("cos").desc, col("id_n").asc), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** IVF-style cell assignment: nearest centroid by cosine (centroids are
    * broadcast; assignment is a per-row argmax, one narrow pass).
    */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // same narrow argmin as [[assignNearestEuclid]]: one broadcast
    // centroid array row, array_min over (negated cos, centroid_id)
    // structs — no window, no shuffle of the corpus
    val centsRow = centroids.toDF("centroid_id", "v_c", "n2_c")
      .agg(array_sort(collect_list(
        struct(col("centroid_id"), col("v_c"), col("n2_c")))).as("cents"))
    val best = array_min(transform(col("cents"), s =>
      struct((-cosineFromParts(dot(col("v"), s.getField("v_c")),
        col("n2"), s.getField("n2_c"))).as("negcos"),
        s.getField("centroid_id").as("centroid_id"))))
    corpus.toDF("id", "v", "n2")
      .crossJoin(broadcast(centsRow))
      .withColumn("best", best)
      .select(col("id"), col("best.centroid_id").as("centroid_id"),
        round(-col("best.negcos"), 6).as("cos"))
  }

  // ---- Product quantization (ADC search over compressed codes) -------

  /** Deterministic PQ codebook component in [-1, 1): md5-derived like
    * [[planeComponent]], keyed "pq<sub>:<code>:<dim>" — a constant per
    * cell, computed driver-side from a formula the oracle reproduces in
    * SQL. (A production codebook comes from per-subspace k-means — v7
    * has the trainer; a fixed seeded codebook keeps the query
    * hash-checkable while exercising the identical encode/ADC shape.)
    */
  def pqComponent(sub: Int, code: Int, dim: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pq$sub:$code:$dim".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59).toDouble - 1.0
  }

  /** Per-subspace squared distances to every codebook entry:
    * dists[s][c] = ||v_sub(s) − cb(s)(c)||², the shared kernel of both
    * PQ encode (argmin per row over the corpus) and the per-probe ADC
    * table (the same array, looked up instead of minimized). One narrow
    * projection over codebook LITERALS — subs·codes·subDim fused
    * multiply-adds per row inside codegen, zero shuffle.
    */
  def pqDistances(v: Column, subs: Int, codes: Int, dim: Int): Column = {
    val subDim = dim / subs
    array((0 until subs).map { s =>
      array((0 until codes).map { c =>
        val cb = array((0 until subDim)
          .map(j => lit(pqComponent(s, c, j))): _*)
        euclid2(slice(v, s * subDim + 1, subDim), cb)
      }: _*)
    }: _*)
  }

  /** PQ code word per subspace: index of the exact minimum distance
    * (array_position of array_min — first match, so ties break to the
    * LOWEST code on both engines). 0-based, `codes ≤ 256` → one byte
    * per subspace: the corpus representation ADC scans is subs bytes
    * per vector (32× smaller than the float32 rows here).
    */
  def pqEncode(dists: Column): Column =
    transform(dists, dl =>
      (array_position(dl, array_min(dl)) - 1).cast("int"))

  /** Asymmetric-distance (ADC) top-k over PQ codes: the corpus is
    * encoded ONCE to subs-byte code rows; each probe precomputes its
    * subs×codes distance table and is broadcast; scoring a corpus row
    * is subs table LOOKUPS folded left in subspace order (no float
    * kernel on the scan side — the property that makes ADC the 100 TB
    * scan format). Approximate distance ties (identical code rows)
    * break by id_n; the fold order is fixed so both engines produce
    * bit-identical sums.
    */
  def pqTopK(corpus: DataFrame, probes: DataFrame, subs: Int,
      codes: Int, dim: Int, k: Int): DataFrame = {
    val enc = corpus.select(col("id").as("id_n"),
      pqEncode(pqDistances(col("v"), subs, codes, dim)).as("codes"))
    val ptab = probes.select(col("id").as("id_q"),
      pqDistances(col("v"), subs, codes, dim).as("dtab"))
    val ad2 = aggregate(sequence(lit(0), lit(subs - 1)), lit(0.0),
      (a, s) => a + element_at(element_at(col("dtab"), s + 1),
        element_at(col("codes"), s + 1) + 1))
    val joined = enc.crossJoin(broadcast(ptab))
      .filter(col("id_q") =!= col("id_n"))
      .select(col("id_q"), col("id_n"), ad2.as("ad2"))
    RelationalOps.topKPerGroup(joined, Seq("id_q"),
        Seq(col("ad2").asc, col("id_n").asc), k, rankCol = "rank")
      .select(col("id_q"), col("id_n"), round(col("ad2"), 6).as("ad2"),
        col("rank").cast("long").as("rank"))
  }

  // ---- Lloyd k-means (iterative clustering, bit-reproducible) ---------

  /** Squared Euclidean distance via the same index-ordered left fold as
    * [[dotHof]] — bit-reproducible across engines, which is what lets
    * an ITERATIVE algorithm hash-match an oracle: identical distances →
    * identical argmin assignments → identical next-round centroids.
    */
  def euclid2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e)

  /** One Lloyd ASSIGN step: nearest centroid per point (min squared-L2,
    * centroid_id tie-break). `points` = (id, v); `cents` = (cid, c).
    *
    * ZERO corpus movement: the K centroids collapse to ONE array row
    * (an O(K·dim) aggregate — trivial), that row is broadcast, and the
    * per-point argmin is `array_min` over (d2, cid) structs — struct
    * ordering IS the (distance asc, centroid_id asc) tie-break, so no
    * window, no shuffle of the points, just a narrow projection. The
    * first formulation here was a crossJoin + window argmin, which
    * re-shuffled the entire corpus on point id once per Lloyd round —
    * exactly the kind of hidden exchange that turns an iterative
    * algorithm quadratic-ish in wall-clock at 100 TB (plan-guarded
    * against regression in PlanAuditSpec). Returns (id, v, cid, d2) —
    * v is carried through because the UPDATE step consumes it next.
    */
  def assignNearestEuclid(points: DataFrame, cents: DataFrame): DataFrame = {
    val centsRow = cents.agg(
      array_sort(collect_list(struct(col("cid"), col("c")))).as("cents"))
    val best = array_min(transform(col("cents"),
      s => struct(euclid2(col("v"), s.getField("c")).as("d2"),
        s.getField("cid").as("cid"))))
    points.crossJoin(broadcast(centsRow))
      .withColumn("best", best)
      .select(col("id"), col("v"), col("best.cid").as("cid"),
        col("best.d2").as("d2"))
  }

  /** Ranked EUCLIDEAN cell assignment: each point's `k` nearest
    * centroids with their rank (1 = nearest) — [[assignNearestEuclid]]
    * generalized for multi-probe membership (rk = 1 reproduces it
    * exactly: same fold, same (d2, cid) struct-order tiebreak). Same
    * zero-corpus-movement shape: one broadcast centroid row, a sorted
    * slice, an in-row posexplode — fan-out is exactly k×, never a
    * shuffle. Returns (id, v, cid, rk). */
  def assignTopKEuclid(points: DataFrame, cents: DataFrame,
      k: Int): DataFrame = {
    val centsRow = cents.agg(
      array_sort(collect_list(struct(col("cid"), col("c")))).as("cents"))
    val top = slice(array_sort(transform(col("cents"),
      s => struct(euclid2(col("v"), s.getField("c")).as("d2"),
        s.getField("cid").as("cid")))), 1, k)
    points.crossJoin(broadcast(centsRow))
      .select(col("id"), col("v"), posexplode(top).as(Seq("pos", "r")))
      .select(col("id"), col("v"), col("r.cid").as("cid"),
        (col("pos") + 1).cast("long").as("rk"), col("r.d2").as("d2"))
  }

  /** One Lloyd UPDATE step: elementwise mean of each cluster's vectors,
    * INTEGER-EXACT until one final division — components are scaled to
    * fixed point (`floor(x·10^6)`, exact longs; floor rather than round
    * because round-half tie behavior differs across engines), summed
    * exactly, and divided once by n·10^6. The usual
    * `avg(double)` would be partition-order-dependent and could flip a
    * borderline next-round assignment on one engine but not the other.
    *
    * Shape: posexplode (×dim) → hash agg to K·dim cells (map-side
    * partials — the shuffle carries K·dim rows per partition, not the
    * corpus) → K rows of re-assembled mean arrays (array_sort by pos
    * makes collect_list's nondeterministic order irrelevant).
    */
  def centroidMeans(assigned: DataFrame): DataFrame = {
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("cid"), col("pos"),
        floor(col("x") * lit(1000000.0)).as("fx"))
      .groupBy("cid", "pos")
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .select(col("cid"), col("pos"), (col("sfx").cast("double") /
        (col("n") * lit(1000000L)).cast("double")).as("ci"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("ci")))),
        s => s.getField("ci")).as("c"))
  }
}
