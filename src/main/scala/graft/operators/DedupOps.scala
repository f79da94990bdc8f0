package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline extension (SURVEY.md
  * §2.10): exact hash-dedup, n-gram Jaccard, MinHash+LSH banding, SimHash.
  * These generalize the reference's only dedup mechanism — the J1 left-anti
  * join on a natural key (`weather_report_data_full_load_pipeline.py:163-167`)
  * — from equality on a key to similarity on content.
  *
  * Scale design (the whole point at 100 TB):
  *  - Signatures (shingles, minhash, simhash) are computed in a single
  *    narrow projection per document — higher-order array functions, no
  *    explode until the join key is as small as a band signature.
  *  - Candidate generation is always an equi-join on a short key (band
  *    signature / simhash chunk / shingle), never an O(n²) cross join.
  *    Candidate verification (exact Jaccard / hamming) runs only on the
  *    equi-join survivors.
  *  - The shingle-pair join caps shingle document-frequency first: a
  *    shingle present in thousands of documents generates O(df²) candidate
  *    pairs while carrying no signal. Dropping df > cap shingles bounds
  *    the join fan-out — the standard trick from web-scale dedup pipelines.
  *  - All hashes are md5-derived (portable across engines for the oracle;
  *    at production scale swap in xxhash64 via the same seeded interface).
  */
object DedupOps {

  /** Seeded portable 60-bit hash: md5 of "seed:value", first 15 hex digits. */
  def hash60(seed: Column, s: Column): Column =
    TextOps.md5Prefix60(concat(seed, lit(":"), s))

  /** Distinct word k-shingles of a token array (order-preserving windows,
    * then set semantics — Jaccard is over shingle *sets*).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup over an arbitrary canonicalization: group by the content
    * hash, elect the minimum id as keeper. Pure hash aggregation — one
    * shuffle on the hash, no joins.
    */
  def exactDedup(df: DataFrame, idCol: String, keyHash: Column): DataFrame =
    df.groupBy(keyHash.as("text_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Exploded (id, setSize, shingle) view with a document-frequency cap:
    * shingles occurring in more than `maxDocFreq` docs are dropped before
    * any pair join (they contribute O(df²) candidate pairs and ~0 signal).
    */
  def shingleIndex(docs: DataFrame, idCol: String, shCol: String,
      maxDocFreq: Long): DataFrame = {
    val e = docs.select(col(idCol).as("id"),
      size(col(shCol)).cast("long").as("n"), explode(col(shCol)).as("s"))
    val rare = e.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq).select("s")
    e.join(rare, Seq("s"))
  }

  /** Exact n-gram Jaccard over candidate pairs from the inverted shingle
    * index: pairs sharing >= 1 (df-capped) shingle, similarity
    * |A∩B| / (|A|+|B|-|A∩B|), thresholded.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, shCol: String,
      threshold: Double, maxDocFreq: Long = 1000L): DataFrame = {
    val e = shingleIndex(docs, idCol, shCol, maxDocFreq)
    val a = e.toDF("s", "id_a", "n_a")
    val b = e.toDF("s", "id_b", "n_b")
    a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature table (id, sig: array[n]): for seeds 0..n-1, the
    * minimum seeded hash over the document's shingle set.
    *
    * Shape matters: the n seeded hashes are computed once per shingle in a
    * single projection (an inlined nested-lambda formulation re-evaluates
    * the shingle construction per seed), and the per-seed minima come from
    * a hash aggregate — partial aggregation collapses each document to one
    * row before the shuffle, so the exchange is O(docs), not O(shingles).
    */
  def minhashSigs(docs: DataFrame, idCol: String, shCol: String,
      n: Int): DataFrame = {
    val e = docs
      .select(col(idCol).as("id"), explode(col(shCol)).as("s"))
      .select(col("id"), transform(sequence(lit(0), lit(n - 1)),
        i => hash60(i.cast("string"), col("s"))).as("hv"))
    e.groupBy("id").agg(
      array((0 until n).map(i => min(element_at(col("hv"), i + 1))): _*)
        .as("sig"))
  }

  /** LSH banding: explode the signature into `bands` rows keyed by the
    * concatenated minhashes of that band — docs agreeing on any full band
    * become candidates via a plain equi-join on (band, sig).
    */
  def lshBands(docs: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"), col(sigCol))
      .select(col("id"), col("band"),
        concat_ws(",",
          slice(col(sigCol), col("band") * rowsPerBand + 1, lit(rowsPerBand)))
          .as("sig"))

  /** Distinct candidate pairs sharing at least one LSH band. */
  def lshCandidates(bandsDf: DataFrame): DataFrame = {
    val a = bandsDf.toDF("id_a", "band", "sig")
    val b = bandsDf.toDF("id_b", "band", "sig")
    a.join(b, Seq("band", "sig")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** 60-bit SimHash over a document's distinct tokens: per bit j, sum the
    * ±1 votes of each token hash's j-th bit; the fingerprint sets bit j
    * when the vote is positive. One explode to (id, tokenHash), then a
    * single 60-column hash aggregation — shuffle size is O(docs), not
    * O(tokens).
    */
  def simhash(docs: DataFrame, idCol: String, toksCol: Column,
      bits: Int = 60): DataFrame = {
    // Token hashes are materialized through the aggregation barrier
    // (md5 once per token), and the 60 bit-votes fold over the collected
    // hash list in one narrow projection. A 60-column sum() aggregate
    // would work too, but its generated code is enormous — it thrashes
    // the whole-stage-codegen cache when many queries share the session.
    val tok = docs
      .select(col(idCol).as("id"), explode(array_distinct(toksCol)).as("t"))
      .select(col("id"), hash60(lit("t"), col("t")).as("h"))
    val hs = tok.groupBy("id").agg(collect_list(col("h")).as("hs"))
    val powers = array((0 until bits).map(j => lit(1L << j)): _*)
    val fingerprint = aggregate(powers, lit(0L), (acc, p) =>
      acc + when(
        aggregate(col("hs"), lit(0L), (vacc, h) =>
          vacc + when(h.bitwiseAND(p) =!= lit(0L), lit(1L))
            .otherwise(lit(-1L))) > 0, p).otherwise(lit(0L)))
    hs.select(col("id"), fingerprint.as("simhash"))
  }

  /** Hamming-LSH over SimHash: split the fingerprint into `chunks` equal
    * bit ranges; pairs within hamming distance < chunks must share a chunk
    * (pigeonhole), so chunk equality is a complete candidate generator.
    */
  def simhashChunks(sims: DataFrame, chunks: Int, chunkBits: Int): DataFrame =
    sims.select(col("id"), col("simhash"),
      explode(sequence(lit(0), lit(chunks - 1))).as("j"))
      .select(col("id"), col("simhash"), col("j"),
        expr(s"shiftright(simhash, $chunkBits * j)")
          .bitwiseAND(lit((1L << chunkBits) - 1)).as("chunk"))

  /** Candidate pairs by shared chunk, verified by exact hamming distance. */
  def simhashPairs(sims: DataFrame, maxHamming: Int, chunks: Int = 4,
      chunkBits: Int = 15): DataFrame = {
    val c = simhashChunks(sims, chunks, chunkBits)
    val a = c.toDF("id_a", "sim_a", "j", "chunk")
    val b = c.toDF("id_b", "sim_b", "j", "chunk")
    a.join(b, Seq("j", "chunk")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming",
        expr("bit_count(sim_a ^ sim_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
