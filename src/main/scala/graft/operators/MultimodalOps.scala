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

/** Header-decode output: what a real format sniffer recovers from the
  * first bytes of an image payload without a pixel codec.
  */
final case class MediaHeader(doc_id: Long, format: String, width: Long,
    height: Long)

/** Multimodal-column plumbing (north-star extension): binary columns in,
  * typed features out, via per-partition batch decode.
  *
  * Two decode tiers:
  *  - [[decodeHeaders]] is REAL: it parses spec-conformant PNG/BMP
  *    header bytes (format sniff + width/height), oracle-verified via
  *    `m3_header_decode` over synthesized real image files;
  *  - [[decodeOne]] (pixel features) remains a STUB — this container
  *    ships no pixel codecs. It derives deterministic fake features from
  *    the payload bytes where a real implementation would call
  *    libjpeg/ffmpeg (JNI) or hand the iterator to an Arrow-batched
  *    Python worker.
  * What the tests pin down either way is the Spark-side contract:
  *  - schema: binary + metadata in, fixed `MediaFeatures` schema out;
  *  - batch shape: `mapPartitions` hands the decoder a whole partition's
  *    iterator, so codec/model initialization happens once per partition
  *    (per-row init is the classic 100×-slowdown mistake);
  *  - partitioning: blobs repartition by size budget, never collect().
  */
object MultimodalOps {

  // ---- real image-header codec ------------------------------------------

  /** Byte-level PNG/BMP header encode + parse. Spec-conformant structures
    * (PNG: RFC 2083 signature + IHDR/IEND chunks with real CRC32s; BMP:
    * BITMAPFILEHEADER + BITMAPINFOHEADER) built and parsed by hand — no
    * codec dependency, because only the header fields matter here. The
    * fixtures carry no pixel data (IDAT / pixel array omitted), which is
    * exactly the honest scope: header metadata is real, pixel decode
    * still needs a real codec (see [[MultimodalOps.decodeOne]]).
    */
  object ImageHeaders {
    import java.nio.{ByteBuffer, ByteOrder}

    private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
      .map(_.toByte)

    private def crc32(bytes: Array[Byte], from: Int, len: Int): Int = {
      val c = new java.util.zip.CRC32
      c.update(bytes, from, len)
      c.getValue.toInt
    }

    /** Signature + IHDR (8-bit truecolor, no interlace) + IEND. */
    def encodePng(width: Int, height: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 25 + 12) // sig + IHDR + IEND
      bb.put(PngSig)
      bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
        .putInt(width).putInt(height)
        .put(8.toByte).put(2.toByte) // bit depth, color type
        .put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
      bb.putInt(crc32(bb.array(), 12, 17)) // CRC over type+data
      bb.putInt(0).put("IEND".getBytes("US-ASCII"))
      bb.putInt(crc32(bb.array(), 37, 4))
      bb.array()
    }

    /** BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER (24bpp, no pixels). */
    def encodeBmp(width: Int, height: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte)
        .putInt(54) // file size (header-only fixture)
        .putInt(0) // reserved
        .putInt(54) // pixel-data offset
        .putInt(40) // info-header size
        .putInt(width).putInt(height)
        .putShort(1) // planes
        .putShort(24) // bits per pixel
      bb.array() // remaining 24 info-header bytes stay zero
    }

    /** Sniff + parse: Some((format, width, height)) or None. */
    def decode(bytes: Array[Byte]): Option[(String, Int, Int)] = {
      if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig) &&
        new String(bytes, 12, 4, "US-ASCII") == "IHDR") {
        val bb = ByteBuffer.wrap(bytes, 16, 8)
        Some(("png", bb.getInt, bb.getInt))
      } else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
        val bb = ByteBuffer.wrap(bytes, 18, 8).order(ByteOrder.LITTLE_ENDIAN)
        Some(("bmp", bb.getInt, bb.getInt))
      } else None
    }
  }

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

  /** Synthesize REAL image files (spec-conformant PNG and BMP headers)
    * whose dimensions derive deterministically from the document text —
    * the same md5 formula the `m1` oracle replicates in SQL — so a
    * DuckDB oracle can verify that [[decodeHeaders]] recovers the dims
    * from the actual bytes. PNG for even doc_ids, BMP for odd.
    */
  def synthesizeImages(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    // project to the three narrow columns BEFORE the spread: the
    // repartition exchange then moves 3 longs per row, not the text
    DedupOps.spread(docs
      .select(col("doc_id"),
        (DedupOps.hash60(lit("w"), col("text")) % 640 + 1).as("width"),
        (DedupOps.hash60(lit("h"), col("text")) % 480 + 1).as("height")))
      .as[(Long, Long, Long)]
      .mapPartitions(_.map { case (id, w, h) =>
        if (id % 2 == 0)
          MediaBlob(id, "image/png", ImageHeaders.encodePng(w.toInt, h.toInt))
        else
          MediaBlob(id, "image/bmp", ImageHeaders.encodeBmp(w.toInt, h.toInt))
      })
  }

  /** REAL header decode (no pixel codec needed): sniff the format from
    * the magic bytes and parse width/height out of the PNG IHDR / BMP
    * BITMAPINFOHEADER. Same mapPartitions batch shape as
    * [[decodeFeatures]]; unrecognized payloads are dropped (a production
    * pipeline would route them to a quarantine sink).
    */
  def decodeHeaders(blobs: Dataset[MediaBlob]): Dataset[MediaHeader] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        ImageHeaders.decode(b.payload).map { case (fmt, w, h) =>
          MediaHeader(b.doc_id, fmt, w.toLong, h.toLong)
        }
      }
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
