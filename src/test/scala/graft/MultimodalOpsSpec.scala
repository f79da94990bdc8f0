package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaBlob, MultimodalOps}

class MultimodalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "αβγ") // incl. empty + multibyte
  ).toDF("doc_id", "text")

  test("encodeBmp24/decodeBmp24: pixel bytes round-trip exactly") {
    import MultimodalOps.ImageHeaders
    // 4x2 image, 24 pixel bytes with every nibble bin represented
    val px = Array.tabulate(24)(i => (i * 11).toByte)
    val bmp = ImageHeaders.encodeBmp24(4, 2, px)
    val Some((w, h, sum, hist)) = ImageHeaders.decodeBmp24(bmp)
    assert((w, h) == (4, 2))
    assert(sum == px.map(_ & 0xff).sum.toLong)
    val expectHist = new Array[Long](16)
    px.foreach(b => expectHist((b & 0xff) >> 4) += 1)
    assert(hist.toSeq == expectHist.toSeq)
    // sign extension trap: bytes >= 0x80 must count as 128..255
    val dark = ImageHeaders.encodeBmp24(4, 1, Array.fill(12)(0xff.toByte))
    assert(ImageHeaders.decodeBmp24(dark).get._3 == 255L * 12)
    // rejects: non-BMP, padded width, truncated pixel region
    assert(ImageHeaders.decodeBmp24(ImageHeaders.encodePng(4, 2)).isEmpty)
    assert(ImageHeaders.decodeBmp24(ImageHeaders.encodeBmp(5, 2)).isEmpty)
    assert(ImageHeaders.decodeBmp24(bmp.dropRight(1)).isEmpty)
    // hostile header: 30000x30000 declares w*h*3 = 2.7e9, which
    // overflows Int to a negative value — without Long arithmetic the
    // truncation guard passes and decode returns a bogus zero-stat row
    val hostile = ImageHeaders.encodeBmp(30000, 30000)
    assert(ImageHeaders.decodeBmp24(hostile).isEmpty,
      "overflowing dims must be rejected, not decoded as empty")
    assert(ImageHeaders.resizeBmp24(hostile, 4, 2).isEmpty)
  }

  test("encodeWav16/decodeWav16: PCM samples round-trip exactly") {
    import MultimodalOps.WavCodec
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = WavCodec.encodeWav16(16000, samples)
    val Some((sr, n, peak, sq)) = WavCodec.decodeWav16(wav)
    assert(sr == 16000 && n == samples.length)
    assert(peak == 32768L, "peak must see |Short.MinValue| = 32768")
    assert(sq == samples.map(s => s.toLong * s).sum)
    // rejects: wrong magic, truncated data, stereo/format lies, and a
    // hostile dataSize that overflows past the truncation guard
    assert(WavCodec.decodeWav16(wav.dropRight(1)).isEmpty)
    assert(WavCodec.decodeWav16("RIFFxxxxWAVE".getBytes).isEmpty)
    val hostile = wav.clone()
    val bb = java.nio.ByteBuffer.wrap(hostile)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue - 2) // declared dataSize >> actual
    assert(WavCodec.decodeWav16(hostile).isEmpty)
    bb.putShort(22, 2) // stereo: out of the codec's declared scope
    assert(WavCodec.decodeWav16(hostile).isEmpty)
  }

  test("decodeWav16Dynamics: zero crossings + |s| sum, hand-computed") {
    import MultimodalOps.WavCodec
    // signs (s < 0): +, -, +, -, + — a crossing at every adjacent
    // step; zero counts as NON-negative (the pinned convention)
    val wav = WavCodec.encodeWav16(8000, Array[Short](1, -1, 2, -3, 0))
    assert(WavCodec.decodeWav16Dynamics(wav) ==
      Some((8000, 5, 4L, 7L)))
    // all non-negative: no crossings; |s| sums the raw magnitudes
    val flat = WavCodec.encodeWav16(8000, Array[Short](0, 5, 3))
    assert(WavCodec.decodeWav16Dynamics(flat) == Some((8000, 3, 0L, 8L)))
    // same validation gauntlet as decodeWav16
    assert(WavCodec.decodeWav16Dynamics(wav.dropRight(1)).isEmpty)
    val hostile = wav.clone()
    java.nio.ByteBuffer.wrap(hostile)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 2)
    assert(WavCodec.decodeWav16Dynamics(hostile).isEmpty)
  }

  test("synthesizeWavs → decodeAudioStats: deterministic, exact") {
    val stats = MultimodalOps.decodeAudioStats(
      MultimodalOps.synthesizeWavs(docs)).collect()
      .map(a => a.doc_id -> a).toMap
    assert(stats.size == 3, "every synthesized payload must decode")
    stats.values.foreach { a =>
      assert(a.n_samples >= 16 && a.n_samples < 272)
      assert(a.sample_rate >= 8000 && a.sample_rate <= 15000)
      assert(a.peak <= 32768L)
      assert(a.sq_sum <= a.n_samples * 32768L * 32768L)
    }
  }

  test("resizeBmp24: identity preserves bytes, 2x upscale replicates") {
    import MultimodalOps.ImageHeaders
    val px = Array.tabulate(24)(i => (i * 7).toByte) // 4x2 source
    val bmp = ImageHeaders.encodeBmp24(4, 2, px)
    // identity resize must reproduce the exact pixel array
    val Some((_, _, idSum, idHist)) = ImageHeaders.decodeBmp24(
      ImageHeaders.resizeBmp24(bmp, 4, 2).get)
    val Some((_, _, srcSum, srcHist)) = ImageHeaders.decodeBmp24(bmp)
    assert(idSum == srcSum && idHist.toSeq == srcHist.toSeq)
    // 2x upscale: every source pixel appears exactly 4 times
    val Some((w2, h2, upSum, _)) = ImageHeaders.decodeBmp24(
      ImageHeaders.resizeBmp24(bmp, 8, 4).get)
    assert((w2, h2) == (8, 4))
    assert(upSum == 4 * srcSum, "NN 2x upscale must replicate each pixel 4x")
    // rejects: PNG payload, non-multiple-of-4 target width
    assert(ImageHeaders.resizeBmp24(ImageHeaders.encodePng(4, 2), 8, 4)
      .isEmpty)
    assert(ImageHeaders.resizeBmp24(bmp, 6, 4).isEmpty)
  }

  test("synthesizePixelBmps → decodePixelStats: deterministic, exact") {
    val out = MultimodalOps.decodePixelStats(
      MultimodalOps.synthesizePixelBmps(docs)).collect()
      .map(x => x.doc_id -> x).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    out.values.foreach { x =>
      assert(x.width >= 4 && x.width <= 32 && x.width % 4 == 0)
      assert(x.height >= 1 && x.height <= 8)
      assert(x.hist.length == 16)
      // histogram partitions the pixel bytes; sum is bounded by 255*n
      val n = x.width * x.height * 3
      assert(x.hist.sum == n)
      assert(x.px_sum >= 0 && x.px_sum <= 255L * n)
    }
    // deterministic across runs
    val again = MultimodalOps.decodePixelStats(
      MultimodalOps.synthesizePixelBmps(docs)).collect()
      .map(x => x.doc_id -> x.px_sum).toMap
    assert(again == out.map { case (k, v) => k -> v.px_sum })
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

  test("encodeY4m/decodeY4m: frame bytes round-trip exactly") {
    import MultimodalOps.Y4MCodec
    // 4x2 C420 frames are 4*2*3/2 = 12 bytes; three frames with
    // distinct contents, incl. >= 0x80 bytes (sign-extension trap)
    val frames = Array(
      Array.tabulate(12)(i => i.toByte),
      Array.tabulate(12)(i => (i * 21).toByte),
      Array.fill(12)(0xff.toByte))
    val y4m = Y4MCodec.encodeY4m(4, 2, frames)
    val Some((w, h, nf, sums)) = Y4MCodec.decodeY4m(y4m)
    assert((w, h, nf) == (4, 2, 3))
    assert(sums.toSeq == frames.toSeq.map(_.map(_ & 0xff).sum.toLong))
    assert(sums(2) == 255L * 12, "0xff bytes must count as 255, not -1")
    // rejects: wrong magic, odd dims, non-C420, truncated final frame,
    // trailing garbage after the last frame, corrupted frame marker
    assert(Y4MCodec.decodeY4m("JUNK W4 H2\n".getBytes).isEmpty)
    assert(Y4MCodec.decodeY4m(
      "YUV4MPEG2 W3 H2 C420\nFRAME\n".getBytes ++ new Array[Byte](9))
      .isEmpty, "odd width is outside C420")
    assert(Y4MCodec.decodeY4m(
      "YUV4MPEG2 W4 H2 C444\nFRAME\n".getBytes ++ new Array[Byte](24))
      .isEmpty, "non-C420 color space must be rejected")
    assert(Y4MCodec.decodeY4m(y4m.dropRight(1)).isEmpty)
    assert(Y4MCodec.decodeY4m(y4m :+ 0.toByte).isEmpty,
      "trailing bytes that are not a full FRAME must be rejected")
    val corrupt = y4m.clone()
    corrupt(y4m.length - 12 - 6) = 'G'.toByte // last frame's marker
    assert(Y4MCodec.decodeY4m(corrupt).isEmpty)
    // hostile header: dims past MaxDim would size a bogus frame; the
    // Long-arithmetic frame size + dim caps must reject it before any
    // allocation or read
    assert(Y4MCodec.decodeY4m(
      "YUV4MPEG2 W65536 H65536 C420\nFRAME\n".getBytes).isEmpty)
    // frame count is recovered from the stream, not the header: a
    // one-frame stream of the same dims reports nf = 1
    assert(Y4MCodec.decodeY4m(Y4MCodec.encodeY4m(4, 2,
      frames.take(1))).get._3 == 1)
  }

  test("synthesizeVideos → decodeVideoStats: deterministic, exact") {
    import graft.operators.DedupOps
    val stats = MultimodalOps.decodeVideoStats(
      MultimodalOps.synthesizeVideos(docs)).collect()
      .map(v => v.doc_id -> v).toMap
    assert(stats.keySet == Set(1L, 2L, 3L))
    // recompute the expected per-frame sums from the md5 formula the
    // synthesizer (and the m6 oracle) uses — the decode must recover
    // them from the actual container bytes
    val seeds = docs.select(col("doc_id"),
      DedupOps.hash60(lit("vw"), col("text")).as("vw"),
      DedupOps.hash60(lit("vh"), col("text")).as("vh"),
      DedupOps.hash60(lit("vf"), col("text")).as("vf"),
      DedupOps.hash60(lit("va"), col("text")).as("va"),
      DedupOps.hash60(lit("vb"), col("text")).as("vb"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    seeds.foreach { case (id, vw, vh, vf, va, vb) =>
      val (w, h, nf) = ((vw % 8 + 1) * 2, (vh % 8 + 1) * 2, vf % 8 + 2)
      val (a, b) = (va % 256, vb % 256) // the synthesizer's byte seeds
      val s = stats(id)
      assert((s.width, s.height, s.n_frames) == (w, h, nf))
      val fs = (w * h * 3 / 2).toInt
      val expect = Array.tabulate(nf.toInt)(k =>
        (0 until fs).map(i => (a * (k.toLong * fs + i) + b) % 256).sum)
      assert(s.f_sums.toSeq == expect.toSeq)
    }
  }

  test("sampleFrames explodes every k-th frame index") {
    val nf = Map(1L -> 1, 2L -> 5, 3L -> 23)
    val f = nf.toSeq.toDF("doc_id", "n_frames")
    val frames = MultimodalOps.sampleFrames(f, 5)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    nf.foreach { case (id, n) =>
      assert(frames(id) == (n + 4) / 5) // ceil(n_frames / 5)
    }
  }

  test("synthesizeSubjectBmps → decodeGrayGrid: subject-keyed near-dups") {
    // same 12-char prefix → near-identical pixels (±3 noise) → tiny
    // aHash hamming; different prefix → unrelated gradients
    val trio = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "the quick brown dog sleeps"), // same 12-char prefix
      (12L, "zzz completely different body")
    ).toDF("doc_id", "text")
    val grids = MultimodalOps.decodeGrayGrid(
      MultimodalOps.synthesizeSubjectBmps(trio))
      .collect().map(g => g.doc_id -> g.grays).toMap
    assert(grids.keySet == Set(10L, 11L, 12L))
    assert(grids(10L).length == 64)
    // grays are exact (r+g+b) div 3 of the clamped synthetic bytes
    grids.values.foreach(_.foreach(g => assert(g >= 0 && g <= 255)))
    def ahash(gs: Array[Long]): Long = {
      val s = gs.sum
      (0 until 60).map(p => if (gs(p) * 64 > s) 1L << p else 0L).sum
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (hNear, hFar) = (
      hamming(ahash(grids(10L)), ahash(grids(11L))),
      hamming(ahash(grids(10L)), ahash(grids(12L))))
    assert(hNear <= 3, s"shared-subject pair must be a near-dup: $hNear")
    assert(hFar > 3, s"unrelated pair must not collide: $hFar")
    // determinism: a second synthesis decodes to identical grays
    val again = MultimodalOps.decodeGrayGrid(
      MultimodalOps.synthesizeSubjectBmps(trio))
      .collect().map(g => g.doc_id -> g.grays).toMap
    assert(again(10L).toSeq == grids(10L).toSeq)
  }

  test("decodeY4mDiffs: adjacent-frame |diff| sums, hand-computed") {
    import MultimodalOps.Y4MCodec
    // 2x2 C420 frames are 6 bytes; f1 reverses f0 (diff 18), f2 = f1
    // (diff 0) — incl. a >= 0x80 byte to catch sign-extension
    val f0 = Array[Byte](0, 1, 2, 3, 4, 5)
    val f1 = Array[Byte](5, 4, 3, 2, 1, 0)
    val f2 = f1.clone()
    val y4m = Y4MCodec.encodeY4m(2, 2, Array(f0, f1, f2))
    val Some((w, h, nf, ds)) = Y4MCodec.decodeY4mDiffs(y4m)
    assert((w, h, nf) == (2, 2, 3))
    assert(ds.toSeq == Seq(18L, 0L))
    val hi = Array(Array[Byte](0, 0, 0, 0, 0, 0),
      Array.fill(6)(0xff.toByte))
    assert(Y4MCodec.decodeY4mDiffs(Y4MCodec.encodeY4m(2, 2, hi))
      .get._4.toSeq == Seq(255L * 6), "0xff reads unsigned")
    // single-frame streams have no pair; hostile inputs still reject
    assert(Y4MCodec.decodeY4mDiffs(
      Y4MCodec.encodeY4m(2, 2, Array(f0))).isEmpty)
    assert(Y4MCodec.decodeY4mDiffs(y4m.dropRight(1)).isEmpty)
    assert(Y4MCodec.decodeY4mDiffs("JUNK W2 H2\n".getBytes).isEmpty)
  }

  test("synthesizeSceneVideos → decodeVideoDiffs: scene structure") {
    val diffs = MultimodalOps.decodeVideoDiffs(
      MultimodalOps.synthesizeSceneVideos(docs)).collect()
      .map(v => v.doc_id -> v).toMap
    assert(diffs.keySet == Set(1L, 2L, 3L))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    diffs.foreach { case (id, v) =>
      assert(v.d_sums.length == v.n_frames - 1)
      val fs = v.width * v.height * 3 / 2
      // recompute the cut flags from the same md5 formula the
      // synthesizer derives them from: a NON-cut pair differs only by
      // the frame jitter, whose wrap-free construction bounds it at
      // |Δ| ≤ 5 per byte — far under the MAD>16 threshold; cut pairs
      // re-seed the recurrence slope
      (1L until v.n_frames).foreach { k =>
        val cut = graft.operators.DedupOps
          .driverHash60(s"vc$k:${texts(id)}") % 4 == 0
        val mad = v.d_sums((k - 1).toInt).toDouble / fs
        if (!cut) assert(mad <= 5.0,
          s"doc $id pair $k: within-scene MAD $mad exceeds jitter bound")
        assert(v.d_sums((k - 1).toInt) >= 0 &&
          v.d_sums((k - 1).toInt) <= 255L * fs)
      }
    }
    // determinism: a second synthesize+decode is byte-identical
    val again = MultimodalOps.decodeVideoDiffs(
      MultimodalOps.synthesizeSceneVideos(docs)).collect()
      .map(v => v.doc_id -> v.d_sums.toSeq).toMap
    assert(diffs.keySet.forall(k => again(k) == diffs(k).d_sums.toSeq))
  }

  test("encodeJpeg/decodeJpeg: SOF0/SOF2 round-trip") {
    import graft.operators.MultimodalOps.ImageHeaders
    assert(ImageHeaders.decodeJpeg(
      ImageHeaders.encodeJpeg(640, 480, 3, progressive = false))
      === Some((false, 640, 480, 3)))
    assert(ImageHeaders.decodeJpeg(
      ImageHeaders.encodeJpeg(17, 1, 1, progressive = true))
      === Some((true, 17, 1, 1)))
    // fill bytes before a marker are legal padding (T.81 B.1.1.2)
    val j = ImageHeaders.encodeJpeg(8, 8, 3, progressive = false)
    val padded = j.take(2) ++ Array(0xFF.toByte, 0xFF.toByte) ++ j.drop(2)
    assert(ImageHeaders.decodeJpeg(padded) === Some((false, 8, 8, 3)))
    // a standalone RST marker mid-stream is skipped, not parsed as a
    // lengthed segment
    val withRst = j.take(2) ++ Array(0xFF.toByte, 0xD0.toByte) ++ j.drop(2)
    assert(ImageHeaders.decodeJpeg(withRst) === Some((false, 8, 8, 3)))
  }

  test("decodeJpeg hostile-header gauntlet") {
    import graft.operators.MultimodalOps.ImageHeaders
    val good = ImageHeaders.encodeJpeg(64, 32, 3, progressive = false)
    // not a JPEG at all / truncated SOI
    assert(ImageHeaders.decodeJpeg("BM junk".getBytes).isEmpty)
    assert(ImageHeaders.decodeJpeg(Array(0xFF.toByte)).isEmpty)
    // truncated mid-segment: every prefix that cuts into or before the
    // SOF segment must fail cleanly, never read out of bounds or loop
    // (a prefix keeping the complete SOF parses — trailing truncation
    // after the frame header is immaterial to a header scan)
    val sofEnd = good.length - 2 // EOI is the last 2 bytes
    (0 until sofEnd).foreach { n =>
      assert(ImageHeaders.decodeJpeg(good.take(n)).isEmpty,
        s"truncation at $n must not parse")
    }
    assert(ImageHeaders.decodeJpeg(good.take(sofEnd)).nonEmpty)
    // segment length < 2 would walk backwards / loop forever
    val loopy = good.clone()
    loopy(4) = 0; loopy(5) = 0 // APP0 length := 0
    assert(ImageHeaders.decodeJpeg(loopy).isEmpty)
    // segment length past the buffer
    val over = good.clone()
    over(4) = 0x7F; over(5) = 0xFF.toByte
    assert(ImageHeaders.decodeJpeg(over).isEmpty)
    // EOI / SOS before any SOF: no frame header, scan data not walked
    assert(ImageHeaders.decodeJpeg(Array(0xFF, 0xD8, 0xFF, 0xD9)
      .map(_.toByte)).isEmpty)
    assert(ImageHeaders.decodeJpeg((Array(0xFF, 0xD8, 0xFF, 0xDA, 0, 4)
      ++ Array.fill(64)(0)).map(_.toByte)).isEmpty)
    // forged component table: declared count inconsistent with length
    val forged = good.clone()
    forged(29) = 4 // SOF payload declares 4 components, length says 3
    assert(ImageHeaders.decodeJpeg(forged).isEmpty)
    // zero dims rejected like the BMP paths
    val zero = good.clone()
    zero(25) = 0; zero(26) = 0 // height := 0
    assert(ImageHeaders.decodeJpeg(zero).isEmpty)
    // lost marker sync (a non-FF where a marker must start)
    val desync = good.clone()
    desync(2) = 0x12
    assert(ImageHeaders.decodeJpeg(desync).isEmpty)
  }

  test("synthesizeJpegs → decodeJpegHeaders recovers all fields") {
    val out = MultimodalOps.decodeJpegHeaders(
      MultimodalOps.synthesizeJpegs(docs)).collect()
      .map(h => h.doc_id -> h).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    out.foreach { case (id, h) =>
      assert(h.progressive === (id % 2 == 0))
      assert(h.width >= 1 && h.width <= 640)
      assert(h.height >= 1 && h.height <= 480)
      assert(h.n_components == 1L || h.n_components == 3L)
    }
  }
}
