package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque media payload: image/audio/video bytes plus routing metadata.
  * At 100 TB these are the heavy columns — keep them in their own parquet
  * column (columnar pruning skips them unless selected) and size
  * partitions by `spark.sql.files.maxPartitionBytes` so a partition of
  * blobs fits executor memory.
  */
final case class MediaBlob(doc_id: Long, media_type: String,
    payload: Array[Byte])

/** Fixed-schema decode output: typed metadata + a small feature vector. */
final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
    n_frames: Int, brightness: Double, histogram: Array[Float])

/** Multimodal-column plumbing (north-star extension): binary columns in,
  * typed features out, via per-partition batch decode.
  *
  * The decode itself is a STUB — this container ships no image/audio
  * codecs. `decodeOne` derives deterministic fake dimensions/features from
  * the payload bytes where a real implementation would call libjpeg/ffmpeg
  * (JNI) or hand the iterator to an Arrow-batched Python worker. What IS
  * real, and what the tests pin down, is the Spark-side contract:
  *  - schema: binary + metadata in, fixed `MediaFeatures` schema out;
  *  - batch shape: `mapPartitions` hands the decoder a whole partition's
  *    iterator, so codec/model initialization happens once per partition
  *    (per-row init is the classic 100×-slowdown mistake);
  *  - partitioning: blobs repartition by size budget, never collect().
  */
object MultimodalOps {

  /** Wrap documents as fake media blobs (payload = utf-8 bytes). The raw
    * scan is spread first so the per-partition decode downstream uses the
    * whole machine, not the scan's single input split.
    */
  def mediaBlobs(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    DedupOps.spread(docs)
      .select(col("doc_id"), lit("image/fake").as("media_type"),
        encode(col("text"), "UTF-8").as("payload")).as[MediaBlob]
  }

  /** STUB decode: deterministic fake. Real codec goes here. */
  def decodeOne(b: MediaBlob): MediaFeatures = {
    val bytes = b.payload
    // stand-in for "parse the header": dims from a byte hash
    val h = bytes.foldLeft(0L)((acc, x) => (acc * 31 + (x & 0xff)) &
      0x7fffffffffffffffL)
    val hist = new Array[Float](16)
    bytes.foreach(x => hist((x & 0xff) % 16) += 1f)
    val n = math.max(bytes.length, 1)
    MediaFeatures(b.doc_id,
      width = (h % 640 + 1).toInt,
      height = (h / 640 % 480 + 1).toInt,
      n_frames = (h % 30 + 1).toInt,
      brightness = bytes.map(x => (x & 0xff).toDouble).sum / n,
      histogram = hist.map(_ / n))
  }

  /** Batch decode: one decoder per partition, streaming the iterator. */
  def decodeFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // real impl: initialize the codec/model ONCE here, then map
      it.map(decodeOne)
    }
  }

  /** Frame sampling stub: every k-th frame index of a video payload —
    * the row-explosion shape (1 blob → n_frames/k rows) that matters for
    * sizing downstream partitions.
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int)
      : DataFrame =
    features.toDF().select(col("doc_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(everyK)))
        .as("frame_idx"))
}
