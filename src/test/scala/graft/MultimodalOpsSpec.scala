package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaBlob, MultimodalOps}

class MultimodalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "αβγ") // incl. empty + multibyte
  ).toDF("doc_id", "text")

  test("mediaBlobs carries utf-8 payload bytes with typed schema") {
    val blobs = MultimodalOps.mediaBlobs(docs).collect()
      .map(b => b.doc_id -> b.payload.length).toMap
    assert(blobs == Map(1L -> 11, 2L -> 0, 3L -> 6))
  }

  test("decodeFeatures: fixed schema, deterministic, bounded dims") {
    val f = MultimodalOps.decodeFeatures(MultimodalOps.mediaBlobs(docs))
      .collect().map(x => x.doc_id -> x).toMap
    assert(f.keySet == Set(1L, 2L, 3L))
    f.values.foreach { x =>
      assert(x.width >= 1 && x.width <= 640)
      assert(x.height >= 1 && x.height <= 480)
      assert(x.n_frames >= 1 && x.n_frames <= 30)
      assert(x.histogram.length == 16)
    }
    // deterministic across runs
    val again = MultimodalOps.decodeFeatures(MultimodalOps.mediaBlobs(docs))
      .collect().map(x => x.doc_id -> x.width).toMap
    assert(again == f.map { case (k, v) => k -> v.width })
    // empty payload doesn't crash or divide by zero
    assert(f(2L).brightness == 0.0)
  }

  test("ImageHeaders: PNG/BMP encode-decode round-trip, rejects garbage") {
    import MultimodalOps.ImageHeaders
    // boundary + multi-byte dims (>255 exercises all four width bytes)
    for ((w, h) <- Seq((1, 1), (640, 480), (300, 7), (65537, 2))) {
      assert(ImageHeaders.decode(ImageHeaders.encodePng(w, h)) ==
        Some(("png", w, h)))
      assert(ImageHeaders.decode(ImageHeaders.encodeBmp(w, h)) ==
        Some(("bmp", w, h)))
    }
    assert(ImageHeaders.decode("not an image".getBytes).isEmpty)
    assert(ImageHeaders.decode(Array.emptyByteArray).isEmpty)
    // truncated headers must not parse
    assert(ImageHeaders.decode(
      ImageHeaders.encodePng(10, 10).take(20)).isEmpty)
    assert(ImageHeaders.decode(
      ImageHeaders.encodeBmp(10, 10).take(10)).isEmpty)
    // a real PNG's fixed header bytes appear where the spec says
    val png = ImageHeaders.encodePng(2, 3)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P')
  }

  test("synthesizeImages → decodeHeaders recovers dims from real bytes") {
    val out = MultimodalOps.decodeHeaders(
      MultimodalOps.synthesizeImages(docs)).collect()
      .map(x => x.doc_id -> x).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L).format == "png" && out(1L).format == "bmp")
    out.values.foreach { x =>
      assert(x.width >= 1 && x.width <= 640)
      assert(x.height >= 1 && x.height <= 480)
    }
  }

  test("sampleFrames explodes every k-th frame index") {
    val f = MultimodalOps.decodeFeatures(MultimodalOps.mediaBlobs(docs))
    val frames = MultimodalOps.sampleFrames(f, 5)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val nf = f.collect().map(x => x.doc_id -> x.n_frames).toMap
    nf.foreach { case (id, n) =>
      assert(frames(id) == (n + 4) / 5) // ceil(n_frames / 5)
    }
  }
}
