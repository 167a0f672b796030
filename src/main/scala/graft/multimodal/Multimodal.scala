package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video payloads ride through
  * the pipeline as opaque `binary` columns with a typed metadata
  * struct, exactly as a 100 TB training-data pipeline carries them
  * (decode only at the consumer edge, never in the shuffle path).
  *
  * The IMAGE path is REAL end to end (r14): `javax.imageio` ships in
  * the JDK, so `withImageBlob`/`decodeImageStats`/`resizeImagesNN`
  * run actual PNG encode → decode → resample → encode pixel kernels
  * on executors, oracle-checked against analytic pixel sums. The
  * AUDIO path is REAL too (r15): `javax.sound.sampled` ships in the
  * JDK, so `withAudioBlob`/`decodeAudioStats` run actual WAV/PCM
  * encode → header parse → sample decode, oracle-checked against
  * analytic sample sums. The VIDEO path is REAL as of r16 for
  * uncompressed streams: AVI is RIFF (same chunk grammar as WAV) and
  * 'DIB ' frames are raw bottom-up BGR24 rasters, so
  * `withVideoBlob`/`decodeVideoStats`/`sampleVideoFrames` run an
  * actual container encode → chunk-tree parse → frame demux → raster
  * decode, oracle-checked like the others. COMPRESSED video streams
  * refuse loudly (no pure-JDK codec exists — the honest boundary);
  * the byte-level stubs (`fakeDecodeStats`, `frameSample`) remain as
  * the format-agnostic fallback.
  * The shared plumbing is real and load-bearing either way:
  * - the binary column + metadata schema,
  * - batch-shaped per-partition processing (`mapPartitions` over an
  *   iterator, the JVM analog of `mapInPandas` batch UDFs — one
  *   executor-side pass, no collect, no per-row task overhead),
  * - partition-count control for decode parallelism (decode is
  *   CPU-bound, so the operator rescatters when the scan has fewer
  *   partitions than cores).
  */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every encode/decode
  // writes a temp file. Our payloads are small in-memory buffers —
  // per-frame codec calls at corpus scale (5k docs x 6 frames x
  // encode+decode = tens of thousands of temp files per pass) turn
  // into fsync traffic. Memory-cache them instead; the setting loads
  // with the class on each executor. Measured: q139 12.5s -> ~2s.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried alongside every blob. */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)
  ))

  /** Attach a blob column + metadata struct to a corpus.
    *
    * Test harness has no binary tables, so the blob is synthesized
    * from the document text (UTF-8 bytes); the metadata fields are
    * derived deterministically from the payload the way a header
    * parser would read them from a real container format.
    */
  def withBlob(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bytes = encode(col(textCol), "UTF-8")
    docs
      .withColumn("blob", bytes)
      .withColumn(
        "meta",
        struct(
          when(ascii(col(textCol)) % 2 === 0, "png").otherwise("jpeg").as("format"),
          (lit(32) + pmod(ascii(col(textCol)), lit(64))).cast("int").as("width"),
          (lit(32) + pmod(length(col(textCol)), lit(64))).cast("int").as("height"),
          lit(3).as("channels"),
          octet_length(bytes).cast("long").as("n_bytes")
        )
      )
  }

  /** Pure metadata projection — stays fully codegen'd; the blob column
    * is pruned out of the scan when only metadata is consumed.
    */
  def metaStats(withBlobs: DataFrame): DataFrame =
    withBlobs.select(
      col("doc_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_bytes").as("n_bytes"),
      (col("meta.width") * col("meta.height") * col("meta.channels")).cast("long").as("n_pixels")
    )

  /** Corpus rollup over blob metadata (the "what's in this 100 TB
    * bucket" query): per-format counts and byte totals.
    */
  def formatSummary(withBlobs: DataFrame): DataFrame =
    withBlobs
      .groupBy(col("meta.format").as("format"))
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        min(col("meta.width")).as("min_width"),
        max(col("meta.width")).as("max_width"),
        avg(col("meta.width") * col("meta.height")).as("avg_pixels")
      )

  /** STUB resize: recomputes target metadata exactly (the real part —
    * output dims, byte budget via integer area scaling) and stands in
    * for the pixel kernel by truncating the payload to the scaled byte
    * count. Swap the blob expression for a real resampler; the
    * metadata/schema contract is what downstream consumers bind to.
    */
  def resizeStub(withBlobs: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val scaledBytes = expr(
      s"greatest(1L, (meta.n_bytes * $targetW * $targetH) div (CAST(meta.width AS BIGINT) * meta.height))")
    withBlobs
      .withColumn("__rb", scaledBytes)
      .withColumn("blob", expr("substring(blob, 1, __rb)"))
      .withColumn(
        "meta",
        struct(
          col("meta.format").as("format"),
          lit(targetW).as("width"),
          lit(targetH).as("height"),
          col("meta.channels").as("channels"),
          col("__rb").as("n_bytes")
        )
      )
      .drop("__rb")
  }

  /** Frame sampling over a video-like blob: one output row per sampled
    * frame at a fixed byte `stride`, capped at `maxFrames` per blob —
    * the demux step of a video pipeline, with the offset->slice stand-in
    * for a real container demuxer (same stub policy as the decode
    * kernel; the offsets/row-shape/generator plumbing is the real
    * part). A generator in the scan pipeline — no shuffle, no join;
    * output volume is O(frames), never O(blob), and each frame carries
    * its md5 so downstream frame-level dedup works without re-reading
    * payloads.
    */
  def frameSample(withBlobs: DataFrame, stride: Int = 64, frameLen: Int = 16,
                  maxFrames: Int = 16): DataFrame =
    withBlobs
      .select(
        col("doc_id"), col("blob"),
        // ceil(n_bytes / stride), floored at 1: an exact-multiple blob
        // must NOT emit a phantom empty frame past its end (identical
        // md5("") signatures would cluster unrelated blobs in
        // frame-level dedup)
        least(greatest(lit(1L), expr(s"(meta.n_bytes + ${stride - 1}) div $stride")),
          lit(maxFrames.toLong)).cast("int").as("n_frames"))
      .select(col("doc_id"), col("blob"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("frame_idx").cast("long") * stride).as("frame_offset"),
        octet_length(expr(s"substring(blob, frame_idx * $stride + 1, $frameLen)"))
          .as("frame_len"),
        md5(expr(s"substring(blob, frame_idx * $stride + 1, $frameLen)")).as("frame_sig"))

  /** Typed rows crossing the decode boundary. */
  final case class BlobRow(doc_id: Long, blob: Array[Byte], format: String, n_bytes: Long)
  final case class DecodedRow(doc_id: Long, format: String, n_bytes: Long, mean_byte: Double, frames_sampled: Int)

  /** STUB decode kernel — deterministic byte statistics standing in for
    * a real image/audio decode (no codec libraries in this container).
    * A production build replaces ONLY this function body with e.g. a
    * JNI codec call; the surrounding batch plumbing is unchanged.
    */
  def fakeDecodeStats(blob: Array[Byte]): (Double, Int) = {
    if (blob == null || blob.isEmpty) (0.0, 0)
    else {
      var sum = 0L
      var i = 0
      while (i < blob.length) { sum += blob(i) & 0xff; i += 1 }
      // "frame sampling": one frame per 64-byte window (ceil — the
      // same count frameSample emits; an exact-multiple blob has no
      // frame past its end), capped at 16
      (sum.toDouble / blob.length, math.min((blob.length + 63) / 64, 16))
    }
  }

  // ---- REAL pixel path (r14): `javax.imageio` is pure JDK, so the
  // image half of the multimodal family needs no external codec after
  // all — PNG encode, PNG decode, and raster resize below run real
  // pixel kernels on executors. The byte-level stubs above remain for
  // the video flavor (no pure-JDK video codec exists) and as the
  // format-agnostic fallback.

  /** Deterministic RGB raster for a document id: dims and every pixel
    * derive from arithmetic on (id, x, y, channel), so an oracle can
    * recompute the EXACT pixel sums analytically — which turns the
    * real encode→decode round trip into a hash-checkable query
    * instead of a trust-me kernel. Channel value:
    * `(id*31 + c*97 + x*7 + y*13) mod 256`; dims
    * `16 + id mod 33` x `16 + (id*7) mod 33`.
    */
  def synthDims(id: Long): (Int, Int) =
    ((16 + id % 33).toInt, (16 + (id * 7) % 33).toInt)

  def synthChannel(id: Long, c: Int, x: Int, y: Int): Int =
    ((id * 31 + c * 97 + x * 7 + y * 13) % 256).toInt

  private def synthRaster(id: Long): java.awt.image.BufferedImage = {
    val (w, h) = synthDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (synthChannel(id, 0, x, y) << 16) |
            (synthChannel(id, 1, x, y) << 8) |
            synthChannel(id, 2, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  final case class IdRow(doc_id: Long)
  final case class ImageRow(doc_id: Long, blob: Array[Byte])
  final case class ImageStatsRow(doc_id: Long, width: Int, height: Int,
                                 pixel_sum: Long, n_bytes: Long)

  /** Attach a REAL PNG blob per document — encoded executor-side from
    * the deterministic raster (per-partition batch loop, the same
    * shape a real pipeline uses to read blobs out of tar shards).
    */
  def withImageBlob(docs: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = docs.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      docs.select(col("doc_id")), parallelism, spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[IdRow])
      .mapPartitions(_.map(r => ImageRow(r.doc_id, pngBytes(synthRaster(r.doc_id)))))(
        Encoders.product[ImageRow])
      .toDF()
  }

  /** REAL PNG decode: `ImageIO.read` on every blob, summing decoded
    * R+G+B over all pixels. PNG is lossless, so against synthetic
    * blobs the sums equal the analytic formula exactly — the oracle
    * claim that pins codec fidelity end to end. All-integer output
    * (the exactness recipe).
    */
  def decodeImageStats(images: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = images.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      images.select(col("doc_id"), col("blob")), parallelism,
      spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[ImageRow])
      .mapPartitions(_.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
        require(img != null, s"doc ${r.doc_id}: blob is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        ImageStatsRow(r.doc_id, w, h, sum, r.blob.length.toLong)
      })(Encoders.product[ImageStatsRow])
      .toDF()
  }

  /** REAL nearest-neighbor resize: decode, map every target pixel to
    * `src((i*w) / tw, (j*h) / th)` (explicit integer floor — NOT
    * AffineTransformOp, whose half-pixel rounding is implementation
    * lore), re-encode PNG. The mapping is plain integer arithmetic, so
    * the resized pixel sums are ALSO analytic — the oracle checks the
    * full decode→resample→encode→decode chain, not just metadata.
    */
  def resizeImagesNN(images: DataFrame, targetW: Int, targetH: Int,
                     parallelism: Option[Int] = None): DataFrame = {
    require(targetW > 0 && targetH > 0, s"bad target dims ${targetW}x$targetH")
    import org.apache.spark.sql.Encoders
    val spark = images.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      images.select(col("doc_id"), col("blob")), parallelism,
      spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[ImageRow])
      .mapPartitions(_.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
        require(img != null, s"doc ${r.doc_id}: blob is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var j = 0
        while (j < targetH) {
          val sy = (j * h) / targetH
          var i = 0
          while (i < targetW) {
            out.setRGB(i, j, img.getRGB((i * w) / targetW, sy))
            i += 1
          }
          j += 1
        }
        ImageRow(r.doc_id, pngBytes(out))
      })(Encoders.product[ImageRow])
      .toDF()
  }

  // ---- REAL audio path (r15): `javax.sound.sampled` is pure JDK, so
  // the WAV/PCM half of the audio family runs a real codec too — RIFF
  // encode, header parse, and sample decode on executors. Video keeps
  // the byte-level stub (no pure-JDK video codec exists; documented
  // out in SURVEY §8).

  /** Deterministic 16-bit mono PCM waveform for a document id: length
    * and every sample derive from arithmetic on (id, i), so an oracle
    * recomputes the exact sample sums analytically — the audio twin of
    * [[synthChannel]]. Sample `((id*131 + i*7919) mod 65536) - 32768`,
    * length `200 + id mod 300`, rate 8000 Hz.
    */
  def synthAudioLen(id: Long): Int = (200 + id % 300).toInt

  def synthSample(id: Long, i: Int): Int =
    (((id * 131 + i.toLong * 7919) % 65536) - 32768).toInt

  private def wavBytes(id: Long): Array[Byte] = {
    val n = synthAudioLen(id)
    val pcm = new Array[Byte](n * 2) // 16-bit little-endian mono
    var i = 0
    while (i < n) {
      val v = synthSample(id, i)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  final case class AudioStatsRow(doc_id: Long, sample_rate: Int, n_samples: Long,
                                 sample_sum: Long, abs_sum: Long)

  /** Attach a REAL WAV blob per document — RIFF-encoded executor-side
    * from the deterministic waveform (same per-partition batch shape
    * as [[withImageBlob]]).
    */
  def withAudioBlob(docs: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = docs.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      docs.select(col("doc_id")), parallelism, spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[IdRow])
      .mapPartitions(_.map(r => ImageRow(r.doc_id, wavBytes(r.doc_id))))(
        Encoders.product[ImageRow])
      .toDF()
  }

  /** REAL WAV decode: `AudioSystem.getAudioInputStream` parses the
    * RIFF header (rate/bits/channels come from the FILE, not trust),
    * the PCM frames are read back and re-assembled into signed 16-bit
    * samples. PCM is lossless, so against synthetic blobs the sums
    * equal the analytic formula exactly — codec fidelity is
    * hash-checked end to end. Undecodable or non-16-bit-mono-LE blobs
    * refuse loudly. All-integer output (the exactness recipe).
    */
  def decodeAudioStats(audio: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = audio.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      audio.select(col("doc_id"), col("blob")), parallelism,
      spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[ImageRow])
      .mapPartitions(_.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.blob))
        val f = ais.getFormat
        require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
          s"doc ${r.doc_id}: not 16-bit mono little-endian PCM ($f)")
        val pcm = ais.readAllBytes()
        ais.close()
        val n = pcm.length / 2
        var sum = 0L
        var abs = 0L
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
          sum += v
          abs += math.abs(v)
          i += 1
        }
        AudioStatsRow(r.doc_id, f.getSampleRate.toInt, n.toLong, sum, abs)
      })(Encoders.product[AudioStatsRow])
      .toDF()
  }

  // ---- REAL video path (r16): no pure-JDK video CODEC exists, but a
  // video CONTAINER with uncompressed frames needs none — AVI is RIFF
  // (the same chunk grammar as r15's WAV work) and the 'DIB ' stream
  // format is raw bottom-up BGR24 rows, byte-decodable like BMP. The
  // encode below writes a spec-valid minimal AVI (avih + strl/strh/
  // strf + movi '00db' frame chunks); the decode is a REAL container
  // parser — it walks the RIFF chunk tree, reads dims/compression
  // from the BITMAPINFOHEADER (the FILE, not trust), demuxes the
  // frame chunks, and decodes padded bottom-up rows. Frames are
  // deterministic rasters, so pixel sums stay analytic and the whole
  // encode → demux → decode chain is hash-checked like image/audio.

  /** Deterministic video geometry/pixels for a document id: every
    * frame's channel value derives from (id, frame, c, x, y), dims and
    * frame count from id — the video twin of [[synthChannel]].
    * Channel `(id*31 + f*59 + c*97 + x*7 + y*13) mod 256` (c: 0=R,
    * 1=G, 2=B); dims `(8 + id mod 9) x (8 + (id*3) mod 9)`; frames
    * `2 + id mod 5`.
    */
  def synthVideoDims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + (id * 3) % 9).toInt)

  def synthVideoFrames(id: Long): Int = (2 + id % 5).toInt

  def synthVideoChannel(id: Long, f: Int, c: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 59 + c * 97 + x * 7 + y * 13) % 256).toInt

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal spec-valid AVI: RIFF('AVI ') > LIST('hdrl') holding the
    * main header and one 'vids'/'DIB ' stream, then LIST('movi') with
    * one '00db' uncompressed frame chunk per frame. Frame payload is
    * the DIB raster: BOTTOM-UP rows of BGR triples, each row padded to
    * a 4-byte boundary — the actual on-disk format VfW wrote.
    */
  private def aviBytes(id: Long): Array[Byte] = {
    val (w, h) = synthVideoDims(id)
    val nFrames = synthVideoFrames(id)
    val rowStride = ((w * 3 + 3) / 4) * 4
    val payloads = (0 until nFrames).map { f =>
      val frame = new Array[Byte](rowStride * h)
      var y = h - 1 // bottom-up: last raster row first
      var p = 0
      while (y >= 0) {
        var x = 0
        while (x < w) {
          frame(p) = synthVideoChannel(id, f, 2, x, y).toByte // B
          frame(p + 1) = synthVideoChannel(id, f, 1, x, y).toByte // G
          frame(p + 2) = synthVideoChannel(id, f, 0, x, y).toByte // R
          x += 1; p += 3
        }
        p += rowStride - w * 3 // row pad stays zero
        y -= 1
      }
      frame
    }
    aviContainer(w, h, "DIB ", compression = 0, payloads, chunkId = "00db")
  }

  /** Shared AVI container writer: RIFF('AVI ') > LIST('hdrl') holding
    * the main header and one 'vids' stream (handler + biCompression
    * parameterized), then LIST('movi') with one frame chunk per
    * payload ('00db' raw / '00dc' compressed, word-aligned) — the
    * writer half of [[parseAvi]], shared by the raw-DIB and MJPG
    * builders.
    */
  private def aviContainer(w: Int, h: Int, handler: String, compression: Int,
                           payloads: Seq[Array[Byte]], chunkId: String): Array[Byte] = {
    val nFrames = payloads.size
    val maxFrame = payloads.map(_.length).max
    val buf = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      buf.write(v & 0xff); buf.write((v >> 8) & 0xff)
      buf.write((v >> 16) & 0xff); buf.write((v >> 24) & 0xff)
    }
    def bytes(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
    // sizes, inside-out: strf(40) strh(56) avih(56), movi frames
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    bytes(fourcc("RIFF")); le32(riffSize); bytes(fourcc("AVI "))
    bytes(fourcc("LIST")); le32(hdrlSize); bytes(fourcc("hdrl"))
    bytes(fourcc("avih")); le32(56)
    le32(100000); le32(maxFrame * 10); le32(0); le32(0) // usec/frame, bytes/sec, pad, flags
    le32(nFrames); le32(0); le32(1); le32(maxFrame) // frames, initial, streams, bufsize
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0) // dims + reserved[4]
    bytes(fourcc("LIST")); le32(strlSize); bytes(fourcc("strl"))
    bytes(fourcc("strh")); le32(56)
    bytes(fourcc("vids")); bytes(fourcc(handler)) // type, handler
    le32(0); le32(0); le32(0) // flags, prio+lang, initial
    le32(1); le32(10); le32(0); le32(nFrames) // scale, rate, start, length
    le32(maxFrame); le32(-1); le32(0) // bufsize, quality, samplesize
    le32(0); le32(0) // rcFrame (4 shorts)
    bytes(fourcc("strf")); le32(40)
    le32(40); le32(w); le32(h) // biSize, width, height (positive = bottom-up)
    buf.write(1); buf.write(0); buf.write(24); buf.write(0) // planes=1, bitCount=24
    le32(compression); le32(maxFrame); le32(0); le32(0); le32(0); le32(0) // biCompression, size, ppm, clr
    bytes(fourcc("LIST")); le32(moviSize); bytes(fourcc("movi"))
    payloads.foreach { p =>
      bytes(fourcc(chunkId)); le32(p.length); bytes(p)
      if ((p.length & 1) == 1) buf.write(0) // chunks are word-aligned
    }
    buf.toByteArray
  }

  /** Attach a REAL AVI blob per document (same per-partition batch
    * shape as [[withImageBlob]]/[[withAudioBlob]]).
    */
  def withVideoBlob(docs: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = docs.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      docs.select(col("doc_id")), parallelism, spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[IdRow])
      .mapPartitions(_.map(r => ImageRow(r.doc_id, aviBytes(r.doc_id))))(
        Encoders.product[ImageRow])
      .toDF()
  }

  /** biCompression fourcc for Motion-JPEG streams ('MJPG' little-endian). */
  private val FourccMJPG: Int = 0x47504A4D

  /** Smooth synthetic raster for the MJPG path: a per-frame-offset
    * linear gradient, so JPEG's DCT loss stays small and boundable
    * (the DIB raster's high-frequency noise would not survive a lossy
    * codec with a tight error bound). Channel
    * `((id*31 + f*59 + c*97) mod 128) + x*2 + y*3` — the offset is
    * clamped to mod 128 so the value NEVER wraps inside a frame
    * (dims cap at 16, so x*2 + y*3 <= 75 and the max is 203): a
    * mod-256 wrap would cut a sawtooth edge through the image, and
    * DCT ringing at such an edge costs ~128 per sample.
    */
  def mjpegChannel(id: Long, f: Int, c: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 59 + c * 97) % 128).toInt + x * 2 + y * 3

  /** One JPEG-encoded frame at an explicit quality — the JDK ships a
    * real JPEG codec (`javax.imageio`), which is what makes Motion-JPEG
    * the one COMPRESSED video stream this engine decodes for real.
    */
  private def jpegBytes(img: java.awt.image.BufferedImage,
                        writer: javax.imageio.ImageWriter): Array[Byte] = {
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    bos.toByteArray
  }

  /** Minimal spec-valid Motion-JPEG AVI: same container as
    * [[aviBytes]], but the stream handler/biCompression say 'MJPG' and
    * every '00dc' chunk is a complete JPEG image — the format MJPEG
    * cameras and VfW capture cards actually write.
    */
  private def mjpegAviBytes(id: Long, writer: javax.imageio.ImageWriter): Array[Byte] = {
    val (w, h) = synthVideoDims(id)
    val nFrames = synthVideoFrames(id)
    val payloads = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (mjpegChannel(id, f, 0, x, y) << 16) |
              (mjpegChannel(id, f, 1, x, y) << 8) |
              mjpegChannel(id, f, 2, x, y))
          x += 1
        }
        y += 1
      }
      jpegBytes(img, writer)
    }
    aviContainer(w, h, "MJPG", FourccMJPG, payloads, chunkId = "00dc")
  }

  /** Attach a REAL Motion-JPEG AVI blob per document. The JPEG writer
    * is acquired once per PARTITION (per-batch setup, the mapInPandas
    * shape), not per row.
    */
  def withMjpegBlob(docs: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = docs.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      docs.select(col("doc_id")), parallelism, spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[IdRow])
      .mapPartitions { it =>
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        it.map(r => ImageRow(r.doc_id, mjpegAviBytes(r.doc_id, writer)))
      }(Encoders.product[ImageRow])
      .toDF()
  }

  /** REAL compressed-video decode: container parse + per-frame JPEG
    * decode through the JDK's own codec, summing decoded RGB. JPEG is
    * lossy, so unlike [[decodeVideoStats]] the sums are NOT analytic —
    * the caller bounds the error against the expected raster (q139
    * cross-multiplies |pixel_sum − analytic| against the sample count;
    * VideoSpec pins the per-pixel max error). Dims and frame counts
    * ARE exact (they come from the container, not the codec).
    */
  def decodeMjpegStats(videos: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = videos.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      videos.select(col("doc_id"), col("blob")), parallelism,
      spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[ImageRow])
      .mapPartitions(_.map { r =>
        val p = parseAvi(r.doc_id, r.blob)
        require(p.compression == FourccMJPG,
          s"doc ${r.doc_id}: decodeMjpegStats reads MJPG streams; use " +
            s"decodeVideoStats for raw DIB (biCompression=${p.compression})")
        var sum = 0L
        p.frames.foreach { case (off, size) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.blob, off, size))
          require(img != null && img.getWidth == p.width && img.getHeight == p.height,
            s"doc ${r.doc_id}: frame JPEG decode failed or dims drifted")
          var y = 0
          while (y < p.height) {
            var x = 0
            while (x < p.width) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
        }
        VideoStatsRow(r.doc_id, p.width, p.height, p.frames.size, sum, r.blob.length.toLong)
      })(Encoders.product[VideoStatsRow])
      .toDF()
  }

  /** Parsed AVI container state: dims/compression from the stream
    * format header, frame payload offsets from the movi chunk walk.
    */
  private final case class AviParsed(width: Int, height: Int, compression: Int,
                                     frames: Seq[(Int, Int)]) // (offset, size) per frame

  /** REAL RIFF/AVI container parse: walk the chunk tree (word-aligned
    * sizes, LIST subtypes), read the BITMAPINFOHEADER for dims and
    * compression (accepting uncompressed 24-bit BI_RGB and 'MJPG' —
    * the two stream formats the JDK can decode; anything else refuses
    * loudly), and index the movi frame chunks WITHOUT decoding them —
    * the demux step, so a frame sampler pays only for the frames it
    * keeps.
    */
  private def parseAvi(docId: Long, b: Array[Byte]): AviParsed = {
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def cc(off: Int): String = new String(b, off, 4, "US-ASCII")
    require(b.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      s"doc $docId: blob is not an AVI (RIFF) container")
    var width = -1
    var height = -1
    var compression = -1
    // a multi-stream AVI (video + 'auds') has one strf PER stream and
    // the audio one is a WAVEFORMATEX, not a BITMAPINFOHEADER — only
    // the strf following a 'vids' stream header describes the frames
    var lastStreamType = ""
    val frames = Seq.newBuilder[(Int, Int)]
    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = cc(off)
        val size = le32(off + 4)
        val body = off + 8
        id match {
          case "LIST" => walk(body + 4, body + size) // skip subtype fourcc
          case "strh" =>
            require(size >= 8, s"doc $docId: truncated stream header")
            lastStreamType = cc(body) // fccType: 'vids' / 'auds' / ...
          case "strf" if lastStreamType == "vids" =>
            require(size >= 40, s"doc $docId: truncated BITMAPINFOHEADER")
            width = le32(body + 4)
            height = le32(body + 8)
            val bitCount = (b(body + 14) & 0xff) | ((b(body + 15) & 0xff) << 8)
            compression = le32(body + 16)
            require((compression == 0 && bitCount == 24) || compression == FourccMJPG,
              s"doc $docId: only uncompressed 24-bit DIB and MJPG streams decode " +
                s"(biCompression=$compression, biBitCount=$bitCount) — no pure-JDK " +
                "codec exists for other video compressions")
          case "00db" | "00dc" => frames += ((body, size))
          case _ => ()
        }
        off = body + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, 12 + le32(4) - 4)
    require(width > 0 && height > 0, s"doc $docId: no stream format header in AVI")
    AviParsed(width, height, compression, frames.result())
  }

  /** Decode one bottom-up BGR24 DIB frame payload: returns the frame's
    * R+G+B pixel sum.
    */
  private def dibFrameSum(b: Array[Byte], off: Int, w: Int, h: Int): Long = {
    val rowStride = ((w * 3 + 3) / 4) * 4
    var sum = 0L
    var y = 0
    while (y < h) {
      val rowOff = off + (h - 1 - y) * rowStride // bottom-up
      var x = 0
      while (x < w) {
        val p = rowOff + x * 3
        sum += (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  final case class VideoStatsRow(doc_id: Long, width: Int, height: Int,
                                 n_frames: Int, pixel_sum: Long, n_bytes: Long)
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_sum: Long)

  /** REAL video decode: container parse + every frame's raster decoded
    * and summed. Raw DIB frames are lossless, so against synthetic
    * blobs the sums equal the analytic formula exactly — codec
    * fidelity hash-checked end to end, the video twin of
    * [[decodeImageStats]]/[[decodeAudioStats]]. All-integer output.
    */
  def decodeVideoStats(videos: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = videos.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      videos.select(col("doc_id"), col("blob")), parallelism,
      spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[ImageRow])
      .mapPartitions(_.map { r =>
        val p = parseAvi(r.doc_id, r.blob)
        require(p.compression == 0,
          s"doc ${r.doc_id}: decodeVideoStats reads raw DIB streams; use " +
            s"decodeMjpegStats for MJPG (biCompression=${p.compression})")
        var sum = 0L
        p.frames.foreach { case (off, _) => sum += dibFrameSum(r.blob, off, p.width, p.height) }
        VideoStatsRow(r.doc_id, p.width, p.height, p.frames.size, sum, r.blob.length.toLong)
      })(Encoders.product[VideoStatsRow])
      .toDF()
  }

  /** REAL frame sampling (the demux claim): the container walk indexes
    * every frame chunk, but only every `every`-th frame's raster is
    * DECODED — cost O(sampled frames) + an O(container) offset walk,
    * never a full decode. One output row per sampled frame with its
    * pixel sum, the real version of [[frameSample]]'s byte-stride
    * stand-in.
    */
  def sampleVideoFrames(videos: DataFrame, every: Int = 2,
                        parallelism: Option[Int] = None): DataFrame = {
    require(every >= 1, s"bad sampling stride $every")
    import org.apache.spark.sql.Encoders
    val spark = videos.sparkSession
    val src = graft.dedup.Dedup.scatterForCpuStage(
      videos.select(col("doc_id"), col("blob")), parallelism,
      spark.sparkContext.defaultParallelism)
    src.as(Encoders.product[ImageRow])
      .mapPartitions(_.flatMap { r =>
        val p = parseAvi(r.doc_id, r.blob)
        require(p.compression == 0,
          s"doc ${r.doc_id}: sampleVideoFrames reads raw DIB streams " +
            s"(biCompression=${p.compression})")
        p.frames.iterator.zipWithIndex.collect {
          case ((off, _), f) if f % every == 0 =>
            FrameRow(r.doc_id, f, dibFrameSum(r.blob, off, p.width, p.height))
        }
      })(Encoders.product[FrameRow])
      .toDF()
  }

  /** Batch decode: per-partition iterator processing over (id, blob,
    * meta) rows. `mapPartitions` keeps the decode a single executor
    * pass with per-batch (not per-row) setup cost — the JVM equivalent
    * of an Arrow-batched `mapInPandas` UDF. Scatter policy
    * (Dedup.scatterForCpuStage): `parallelism` = Some(n) ALWAYS
    * repartitions to n, Some(0) keeps the input layout, None fans out
    * to every core unless the scan already has at least that many
    * files (one giant tar-shard must not pin decode to one core; an
    * already well-split blob store keeps its layout, no shuffle).
    */
  def decodeFeatures(withBlobs: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = withBlobs.sparkSession
    val src = withBlobs.select(
      col("doc_id"), col("blob"), col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"))
    // shared scatter policy — see Dedup.scatterForCpuStage: Some(n)
    // always fans out, Some(0) keeps layout, None uses the file-count
    // heuristic against defaultParallelism
    val scattered = graft.dedup.Dedup.scatterForCpuStage(
      src, parallelism, spark.sparkContext.defaultParallelism)
    scattered
      .as(Encoders.product[BlobRow])
      .mapPartitions { batch =>
        // per-partition setup (a real codec would init its context here)
        batch.map { b =>
          val (meanByte, frames) = fakeDecodeStats(b.blob)
          DecodedRow(b.doc_id, b.format, b.n_bytes, meanByte, frames)
        }
      }(Encoders.product[DecodedRow])
      .toDF()
  }
}
