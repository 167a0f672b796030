package graft

import org.apache.spark.sql.functions.col

import graft.multimodal.Multimodal

/** REAL video path: AVI/RIFF container encode, chunk-tree parse, frame
  * demux, raw-DIB raster decode — and the honest refusal boundary
  * (compressed streams have no pure-JDK codec).
  */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Long*) = ids.toDF("doc_id")

  test("decode equals the analytic raster sums, per video and per frame") {
    val ids = Seq(0L, 1L, 7L, 12L, 40L, 123L)
    val stats = Multimodal.decodeVideoStats(Multimodal.withVideoBlob(docs(ids: _*)))
      .select("doc_id", "width", "height", "n_frames", "pixel_sum")
      .as[(Long, Int, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.synthVideoDims(id)
      val nf = Multimodal.synthVideoFrames(id)
      var expect = 0L
      for (f <- 0 until nf; c <- 0 until 3; x <- 0 until w; y <- 0 until h)
        expect += Multimodal.synthVideoChannel(id, f, c, x, y)
      assert(stats(id) === ((id, w, h, nf, expect)), s"doc $id")
    }
    // frame sampling decodes exactly the even frames, sums matching
    val frames = Multimodal.sampleVideoFrames(Multimodal.withVideoBlob(docs(7L)), every = 2)
      .select("doc_id", "frame_idx", "frame_sum")
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    val nf7 = Multimodal.synthVideoFrames(7L)
    val (w7, h7) = Multimodal.synthVideoDims(7L)
    assert(frames.map(_._2).toSeq === (0 until nf7 by 2))
    frames.foreach { case (_, f, sum) =>
      var expect = 0L
      for (c <- 0 until 3; x <- 0 until w7; y <- 0 until h7)
        expect += Multimodal.synthVideoChannel(7L, f, c, x, y)
      assert(sum === expect, s"frame $f")
    }
  }

  test("compressed streams and non-AVI blobs refuse loudly") {
    // patch biCompression (strf body + 16) to 1 (BI_RLE8-ish): the
    // parser must refuse naming the no-pure-JDK-codec boundary, never
    // emit garbage sums
    val blob = Multimodal.withVideoBlob(docs(3L))
      .select("blob").as[Array[Byte]].head()
    def findFourcc(b: Array[Byte], cc: String): Int = {
      val pat = cc.getBytes("US-ASCII")
      b.indices.find(i => i + 4 <= b.length && (0 until 4).forall(j => b(i + j) == pat(j))).get
    }
    val strf = findFourcc(blob, "strf")
    val patched = blob.clone()
    patched(strf + 8 + 16) = 1 // biCompression = 1
    val bad = Seq((3L, patched)).toDF("doc_id", "blob")
    val e1 = intercept[Exception](Multimodal.decodeVideoStats(bad).collect())
    assert(e1.getMessage != null || e1.getCause != null)
    def chain(t: Throwable): String = {
      def walk(c: Throwable): Seq[String] =
        if (c == null) Seq.empty else Option(c.getMessage).toSeq ++ walk(c.getCause)
      walk(t).mkString(" | ")
    }
    assert(chain(e1).contains("no pure-JDK"), chain(e1))

    val junk = Seq((9L, "not a riff container at all".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val e2 = intercept[Exception](Multimodal.decodeVideoStats(junk).collect())
    assert(chain(e2).contains("not an AVI"), chain(e2))
  }

  test("the demux walk tolerates '00dc' chunk ids and unknown chunks in the tree") {
    // rewrite every '00db' fourcc to '00dc' (the compressed-id spelling
    // real muxers also use for DIB frames) — the parser must still
    // index every frame
    val blob = Multimodal.withVideoBlob(docs(5L))
      .select("blob").as[Array[Byte]].head()
    val patched = blob.clone()
    var i = 0
    while (i + 4 <= patched.length) {
      if (patched(i) == '0' && patched(i + 1) == '0' &&
          patched(i + 2) == 'd' && patched(i + 3) == 'b') patched(i + 3) = 'c'
      i += 1
    }
    val stats = Multimodal.decodeVideoStats(
        Seq((5L, patched)).toDF("doc_id", "blob"))
      .select("n_frames", "pixel_sum").as[(Int, Long)].head()
    val nf = Multimodal.synthVideoFrames(5L)
    val (w, h) = Multimodal.synthVideoDims(5L)
    var expect = 0L
    for (f <- 0 until nf; c <- 0 until 3; x <- 0 until w; y <- 0 until h)
      expect += Multimodal.synthVideoChannel(5L, f, c, x, y)
    assert(stats === ((nf, expect)))
  }

  private def chainMsg(t: Throwable): String = {
    def walk(c: Throwable): Seq[String] =
      if (c == null) Seq.empty else Option(c.getMessage).toSeq ++ walk(c.getCause)
    walk(t).mkString(" | ")
  }

  test("MJPEG: container facts exact, decoded sums within the lossy bound") {
    val ids = Seq(0L, 3L, 11L, 42L, 257L)
    val stats = Multimodal.decodeMjpegStats(Multimodal.withMjpegBlob(docs(ids: _*)))
      .select("doc_id", "width", "height", "n_frames", "pixel_sum")
      .as[(Long, Int, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.synthVideoDims(id)
      val nf = Multimodal.synthVideoFrames(id)
      assert((stats(id)._2, stats(id)._3, stats(id)._4) === ((w, h, nf)), s"doc $id dims")
      var expect = 0L
      for (f <- 0 until nf; c <- 0 until 3; x <- 0 until w; y <- 0 until h)
        expect += Multimodal.mjpegChannel(id, f, c, x, y)
      val samples = w.toLong * h * 3 * nf
      val err = math.abs(stats(id)._5 - expect)
      assert(err <= samples * 4,
        s"doc $id: decoded sum off by $err over $samples samples (mean ${err.toDouble / samples})")
    }
  }

  test("MJPEG: per-pixel JPEG loss on the gradient raster stays bounded") {
    // codec-loss pin for the q139 bound's headroom: a 0.95-quality JDK
    // JPEG roundtrip of the mjpegChannel gradient never moves any
    // channel sample by more than 32 (measured ~6-16; 2x headroom)
    val id = 42L
    val (w, h) = Multimodal.synthVideoDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (Multimodal.mjpegChannel(id, 0, 0, x, y) << 16) |
          (Multimodal.mjpegChannel(id, 0, 1, x, y) << 8) |
          Multimodal.mjpegChannel(id, 0, 2, x, y))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val got = (back.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
      maxErr = math.max(maxErr, math.abs(got - Multimodal.mjpegChannel(id, 0, c, x, y)))
    }
    assert(maxErr <= 32, s"max per-pixel JPEG error $maxErr")
  }

  test("MJPEG and DIB refuse each other's decoder by name") {
    val mj = Multimodal.withMjpegBlob(docs(7L))
    val e1 = intercept[Exception](Multimodal.decodeVideoStats(mj).collect())
    assert(chainMsg(e1).contains("decodeMjpegStats"), chainMsg(e1))
    val e1b = intercept[Exception](Multimodal.sampleVideoFrames(mj).collect())
    assert(chainMsg(e1b).contains("raw DIB"), chainMsg(e1b))
    val dib = Multimodal.withVideoBlob(docs(7L))
    val e2 = intercept[Exception](Multimodal.decodeMjpegStats(dib).collect())
    assert(chainMsg(e2).contains("decodeVideoStats"), chainMsg(e2))
  }
}
