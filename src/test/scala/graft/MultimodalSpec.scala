package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  test("decode stub: histogram is length-normalized and deterministic") {
    val f1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f1.toSeq === f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq ===
      Seq.fill(Multimodal.FeatureDim)(0f))
  }

  test("media features frame has the contracted schema and row count") {
    val df = Multimodal.mediaFeatures(spark, sf)
    assert(df.schema("features").dataType === ArrayType(FloatType, containsNull = false))
    assert(df.schema("doc_id").dataType === LongType)
    val rows = df.collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val feats = r.getAs[scala.collection.Seq[Float]]("features")
      assert(feats.length === Multimodal.FeatureDim)
      assert(math.abs(feats.sum - 1.0f) < 1e-4)
    }
  }

  test("manifest payload round-trips the document bytes") {
    import spark.implicits._
    val m = Multimodal.mediaManifest(spark, sf)
      .select($"doc_id", $"payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
    docs.foreach { r =>
      assert(m(r.getLong(0)).toSeq === r.getString(1).getBytes("UTF-8").toSeq)
    }
  }

  test("real PNG decode: encode→decode→histogram matches directly-computed pixels") {
    // differential oracle for the REAL codec path: the decoded raster
    // must reproduce the source pixels exactly (PNG is lossless), so
    // the histogram equals one computed straight from the pixel rule —
    // proving ImageIO actually parsed the container rather than
    // hashing raw bytes
    for (text <- Seq("hello world, this is a pixel source",
        "a", "", "x" * 500, (0 until 200).map(i => (i % 96 + 32).toChar).mkString)) {
      val bytes = text.getBytes("UTF-8")
      val png = Multimodal.encodePng(bytes)
      // a real PNG container: 8-byte signature
      assert(png.take(8).toSeq === Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      val (w, h, hist) = Multimodal.decodePngHistogram(png)
      assert(w === Multimodal.PngW && h === Multimodal.PngH)
      val expected = new Array[Float](Multimodal.FeatureDim)
      for (i <- 0 until Multimodal.PngW * Multimodal.PngH) {
        val v = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
        expected(v * Multimodal.FeatureDim / 256) += 1f
      }
      val n = (Multimodal.PngW * Multimodal.PngH).toFloat
      assert(hist.toSeq === expected.map(_ / n).toSeq, s"text=${text.take(20)}")
    }
    // a payload the codec rejects fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.decodePngHistogram("not a png".getBytes)
    }
  }

  test("real resize: decode → nearest-neighbor downsample matches the index map") {
    // the resized raster must equal out(x, y) = source byte
    // ((2y·W + 2x) mod len) — the codec round-trip composed with the
    // explicit resize convention, computed here without any imaging API
    for (text <- Seq("resize me please, a deterministic pixel source",
        "", "zz", (0 until 300).map(i => (i % 96 + 32).toChar).mkString)) {
      val bytes = text.getBytes("UTF-8")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodePng(bytes)))
      val res = Multimodal.resizeNearest(img, Multimodal.ResizeFactor)
      assert(res.getWidth === Multimodal.ResW && res.getHeight === Multimodal.ResH)
      for (y <- 0 until Multimodal.ResH; x <- 0 until Multimodal.ResW) {
        val src = (2 * y) * Multimodal.PngW + 2 * x
        val expected = if (bytes.isEmpty) 0 else bytes(src % bytes.length) & 0xff
        assert(res.getRaster.getSample(x, y, 0) === expected,
          s"pixel ($x,$y) of '${text.take(15)}'")
      }
    }
  }

  test("mm_features_real decodes every document with the contracted shape") {
    val rows = Multimodal.mmFeaturesReal(spark, sf).collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Int]("width") === Multimodal.PngW)
      assert(r.getAs[Int]("height") === Multimodal.PngH)
      assert(math.abs(r.getAs[Double]("feature_sum") - 1.0) < 1e-4)
    }
  }

  test("WAV round-trip ≡ direct computation from the source bytes") {
    // the codec path (javax.sound container write + header parse + PCM
    // read) against first-principles arithmetic on the same bytes —
    // incl. empty (silence), single-byte, and >127 bytes (signed-byte
    // pitfalls on both the encode recenter and the LE sample decode)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      Array[Byte](127, -128.toByte, -1),  // bytes 127, 128, 255
      "the quick brown fox".getBytes("UTF-8"))
    for (bytes <- cases) {
      val (n, rate, sum, hist) =
        Multimodal.decodeWavHistogram(Multimodal.encodeWav(bytes))
      assert(n === Multimodal.WavSamples)
      assert(rate === Multimodal.WavRate)
      val tiled = (0 until Multimodal.WavSamples)
        .map(k => if (bytes.isEmpty) 128 else bytes(k % bytes.length) & 0xff)
      assert(sum === tiled.map(b => ((b - 128) * 256).toLong).sum)
      val expHist = new Array[Float](Multimodal.FeatureDim)
      tiled.foreach(b => expHist(b / 16) += 1f)
      (0 until Multimodal.FeatureDim).foreach { b =>
        assert(hist(b) === expHist(b) / Multimodal.WavSamples,
          s"bin $b of ${bytes.toSeq}")
      }
    }
    // bin boundaries: bytes 0→bin0, 15→bin0, 16→bin1, 255→bin15
    val (_, _, _, h) = Multimodal.decodeWavHistogram(
      Multimodal.encodeWav(Array[Byte](0, 15, 16, -1.toByte)))
    assert(h(0) === 128f / 256 && h(1) === 64f / 256 && h(15) === 64f / 256)
  }

  test("GIF multi-frame round-trip ≡ the frame tiling, all channels agree") {
    // the palette claim the video decoder rests on: ImageIO's GIF
    // writer maps 8-bit gray to a palette whose index decodes to
    // (v,v,v) exactly — verified per pixel per frame against the
    // source tiling, incl. the >127 signed-byte edge
    for (bytes <- Seq("the quick brown fox".getBytes("UTF-8"),
      Array[Byte](0, 127, -128.toByte, -1), Array.emptyByteArray)) {
      val gif = Multimodal.encodeGif(bytes)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(gif)))
      assert(reader.getNumImages(true) === Multimodal.GifFrames)
      for (f <- 0 until Multimodal.GifFrames) {
        val img = reader.read(f)
        for (y <- 0 until Multimodal.PngH; x <- 0 until Multimodal.PngW) {
          val rgb = img.getRGB(x, y)
          val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          val k = f * Multimodal.PngW * Multimodal.PngH + y * Multimodal.PngW + x
          val want = if (bytes.isEmpty) 0 else bytes(k % bytes.length) & 0xff
          assert(r === g && g === b, s"palette not gray at f=$f ($x,$y)")
          assert(r === want, s"pixel f=$f ($x,$y)")
        }
      }
      reader.dispose()
    }
  }

  test("WAV decode rejects non-audio payloads loudly") {
    intercept[Exception] {
      Multimodal.decodeWavHistogram("not a wav".getBytes("UTF-8"))
    }
  }

  test("frame sampling covers every 4th frame with full frames except the tail") {
    val rows = Multimodal.mediaFrameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 4 === 0)
      assert(r.getAs[Int]("frame_bytes") > 0 &&
        r.getAs[Int]("frame_bytes") <= Multimodal.FrameSize)
    }
  }

  test("aHash dedup collapses a one-pixel perturbation, splits a restructured image") {
    import spark.implicits._
    // 192-char payloads fill the 16x12 raster exactly (one byte per
    // pixel). A = high-contrast halves; B = A with ONE byte nudged by 1
    // (the re-encode/noise case byte-level dedup misses — block sums
    // move by 1 against margins of thousands, hash stable); C = the
    // halves swapped (every block mean flips sides, different hash).
    val a = "z" * 96 + "A" * 96
    val b = "y" + "z" * 95 + "A" * 96
    val c = "A" * 96 + "z" * 96
    val got = Multimodal.mmDedupAhashOn(
        Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L)._1 === got(2L)._1, "one-pixel edit must keep the aHash")
    assert(got(1L)._1 !== got(3L)._1, "restructured raster must re-hash")
    assert(got(1L)._2 === 2L && got(2L)._2 === 2L && got(3L)._2 === 1L)
    assert(got(1L)._3 && !got(2L)._3 && got(3L)._3,
      "canonical = min doc_id of each hash group")
  }
}
