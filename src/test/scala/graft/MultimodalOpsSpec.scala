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
