package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** X5: multimodal columns — media payloads travel as opaque `binary`
  * columns with a typed metadata struct, and feature extraction runs
  * batch-shaped over partitions (SURVEY.md §2.10 X5).
  *
  * The container has no native image/audio codecs, so [[decodeStub]]
  * is a clearly-marked deterministic FAKE decode; everything around
  * it — schema, Dataset encoding, partition-parallel batch execution,
  * feature schema — is the real Spark plumbing a production decode
  * UDF would drop into (swap `decodeStub` for an actual codec call;
  * the `mapPartitions` boundary amortizes per-batch model/codec init
  * exactly like `mapInPandas` does in PySpark). One REAL decode path
  * exists alongside the stub: [[decodePng]]/[[extractImageFeatures]]
  * decode actual PNG bytes with the JDK's own `javax.imageio` through
  * the identical seam — proof the boundary carries real binary work.
  * The stub stays because it is value-level oracle-able in DuckDB
  * (`q_multimodal`), which a pixel decode is not.
  *
  * Scale: decode is a narrow map stage — no shuffle, scales linearly
  * with partitions; binary payloads never pass through a wide
  * transformation, so no 2 GB-record or shuffle-spill hazards.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      checksum: Long, feat0: Double, feat1: Double)

  /** Wrap a text table as a media table: payload = UTF-8 bytes, typed
    * metadata struct alongside (stands in for image/audio bytes).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  /** STUB — deterministic fake "decode + feature extraction".
    * A real deployment replaces this body with the codec / model
    * call; signature and batch shape stay identical.
    */
  def decodeStub(payload: Array[Byte]): (Long, Double, Double) = {
    var crc = 0L
    var i = 0
    while (i < payload.length) { crc = crc * 31 + (payload(i) & 0xff); i += 1 }
    val f0 = if (payload.isEmpty) 0.0 else (payload(0) & 0xff) / 255.0
    val f1 = payload.length.toDouble / 4096.0
    (crc, f0, f1)
  }

  /** Batch feature extraction over the media table: one decode pass
    * per partition (per-batch init cost amortized, like mapInPandas).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init would happen here (codec/model handle)
        it.map { r =>
          val (crc, f0, f1) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, crc, f0, f1)
        }
      }
  }

  case class ImageFeatures(
      doc_id: Long, mime: String, width: Int, height: Int,
      avg_r: Double, avg_g: Double, avg_b: Double)

  private def channelMeans(
      img: java.awt.image.BufferedImage): (Int, Int, Double, Double, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    var r = 0L; var g = 0L; var b = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    (w, h, r / n, g / n, b / n)
  }

  /** REAL still-image decode via `javax.imageio` — pure JVM, no
    * native codec, present in every stock JDK — so the
    * `mapPartitions` seam demonstrably carries actual binary decode
    * work, not only the [[decodeStub]] arithmetic. `ImageIO.read`
    * dispatches on the payload's own magic bytes, so the SAME seam
    * decodes PNG, JPEG, GIF and BMP (PNG and JPEG are pixel-truth
    * spec-pinned). Returns None for payloads that are not decodable
    * images (callers keep or drop).
    */
  def decodePng(payload: Array[Byte]): Option[(Int, Int, Double, Double, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None else Some(channelMeans(img))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Format-honest alias of [[decodePng]]: the underlying call is
    * format-agnostic (magic-byte dispatch), and the JPEG spec uses
    * this name.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double, Double, Double)] =
    decodePng(payload)

  /** REAL resize through the same seam — decode (magic-byte dispatch,
    * any ImageIO format), NEAREST-NEIGHBOR rescale to exactly
    * `w` × `h`, re-encode as PNG (lossless, so the resample is the
    * only pixel transformation). Nearest-neighbor is chosen for
    * determinism: no filter kernel, every output pixel is a copy of
    * one input pixel, so solid regions stay bit-exact (the property
    * the spec pins). Returns None for undecodable payloads — same
    * keep-or-drop contract as [[decodeImage]]. Closes the
    * "[[resizeStub]] is the only resize" gap; the stub stays as the
    * byte-domain oracle-able arm.
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    // misconfiguration fails fast; only PAYLOAD problems map to None
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL multi-frame decode: every frame of an animated GIF (or any
    * multi-image container `javax.imageio` has a reader for), with
    * per-frame channel means — the actual decode behind
    * [[sampleFrameImages]]. Frames are composited over the previous
    * canvas per the GIF delta model so a partial (dirty-rect) frame
    * still reports whole-canvas features. Empty for undecodable
    * payloads.
    */
  def decodeFrames(
      payload: Array[Byte]): Seq[(Int, Int, Int, Double, Double, Double)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val reader = readers.next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          var canvas: java.awt.image.BufferedImage = null
          (0 until n).map { i =>
            val frame = reader.read(i)
            if (canvas == null) {
              canvas = new java.awt.image.BufferedImage(
                frame.getWidth, frame.getHeight,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
            }
            val gfx = canvas.createGraphics()
            try gfx.drawImage(frame, 0, 0, null) finally gfx.dispose()
            val (w, h, ar, ag, ab) = channelMeans(canvas)
            (i, w, h, ar, ag, ab)
          }
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Image feature extraction over the media table — the same
    * partition-batched shape as [[extractFeatures]], with the REAL
    * PNG decoder in the hot seat: width/height/mean-channel features
    * per decodable payload; undecodable rows are dropped (they carry
    * no pixel features). Per-partition init disables ImageIO's
    * file-backed cache once per batch — exactly the kind of
    * amortized setup the mapPartitions boundary exists for.
    */
  def extractImageFeatures(
      spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition init
        it.flatMap { r =>
          decodePng(r.payload).map { case (w, h, ar, ag, ab) =>
            ImageFeatures(r.doc_id, r.mime, w, h, ar, ag, ab)
          }
        }
      }
  }

  /** X5b: perceptual average-hash (aHash) of a decoded image — the
    * 64-bit signature behind image NEAR-dup detection (byte-exact
    * image dedup is X1's hash; a re-encoded, resized, or
    * slightly-retouched copy needs a PERCEPTUAL key). The classic
    * aHash: partition the raster into an 8×8 grid, take each cell's
    * mean ITU-R BT.601 luma (0.299r + 0.587g + 0.114b), set bit i
    * (big-endian) iff cell i's mean exceeds the global mean of cell
    * means. Computed directly from the raster with exact
    * integer-indexed block membership (`(y*8)/h`) — no Graphics2D
    * filter kernel in the path, so the hash is deterministic for a
    * given decoded raster. None for undecodable payloads or images
    * smaller than the 8×8 grid (some cells would be empty — too small
    * to carry perceptual structure anyway).
    */
  def imageAvgHash(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = new Array[Double](64)
        val counts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            val c = cy * 8 + x * 8 / w
            sums(c) += lum
            counts(c) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        var tot = 0.0
        while (i < 64) { sums(i) /= counts(i); tot += sums(i); i += 1 }
        val mean = tot / 64.0
        var bits = 0L
        i = 0
        while (i < 64) {
          if (sums(i) > mean) bits |= (1L << (63 - i))
          i += 1
        }
        Some(bits)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  case class ImageHash(doc_id: Long, ahash: Long)

  /** The [[imageAvgHash]] signatures of a media table, through the
    * same `mapPartitions` codec seam as [[extractImageFeatures]] —
    * map-only, keep-or-drop, full scan parallelism.
    */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap(r => imageAvgHash(r.payload).map(ImageHash(r.doc_id, _)))
      }
  }

  /** X5b: image near-dup pairs — Hamming-band LSH over [[imageAvgHash]]
    * signatures (the X2 SimHash machinery applied to the image
    * modality): 8 bands × 8 bits for candidates, exact
    * `bit_count(xor)` ≤ `maxHamming` verified per pair.
    *
    * For `maxHamming` ≤ 7 the banding is LOSSLESS by pigeonhole —
    * a pair differing in ≤ 7 bits cannot touch all 8 bands, so at
    * least one band matches exactly and the pair is a candidate
    * (spec-pinned). Scale shape: band self-join bounded by band-bucket
    * sizes (never all-pairs), verify is codegen'd integer xor/popcount
    * on the candidate set only — the decode cost is one map-only pass,
    * paid once.
    */
  def imageNearDup(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 5): DataFrame =
    hammingNearDup(
      imageHashes(spark, media).toDF().withColumnRenamed("ahash", "hash"),
      maxHamming)

  /** Shared Hamming-band pair machinery over any (doc_id, hash)
    * 64-bit-signature frame — [[imageNearDup]] and [[audioNearDup]]
    * are this on their modality's perceptual hash: 8 bands × 8 bits
    * candidates, exact codegen'd `bit_count(xor)` ≤ `maxHamming`
    * verify. For `maxHamming` ≤ 7 the banding is LOSSLESS by
    * pigeonhole — a pair differing in ≤ 7 bits cannot touch all 8
    * bands, so at least one band matches exactly (spec-pinned at the
    * boundary). Band self-join bounded by band-bucket sizes, never
    * all-pairs.
    */
  def hammingNearDup(sig0: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"banding is lossless only for maxHamming in [0,7], got $maxHamming")
    // cached: the band self-join would otherwise decode both sides
    val sig = sig0.select(col("doc_id"), col("hash")).cache()
    val bandArr = array((0 until 8).map(b =>
      shiftright(col("hash"), b * 8).bitwiseAND(lit(255L))): _*)
    val bands = sig.select(col("doc_id"), col("hash"),
      posexplode(bandArr).as(Seq("band", "bsig")))
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "bsig"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.hash").as("ha"),
        col("b.doc_id").as("id_b"), col("b.hash").as("hb"))
      .distinct()
    val ham = bit_count(col("ha").bitwiseXOR(col("hb")))
    CacheLifecycle.releaseAfterAction(
      cand.withColumn("hamming", ham.cast("long"))
        .filter(col("hamming") <= maxHamming)
        .select(col("id_a"), col("id_b"), col("hamming")),
      sig)
  }

  /** X5c: energy-envelope fingerprint of decoded audio — the audio
    * member of the perceptual-hash family ([[imageAvgHash]]'s
    * construction on the time axis): mono-mix the PCM frames, split
    * them into 64 equal windows by exact integer membership
    * (`(frame*64)/nFrames`), take each window's mean |amplitude| on
    * the [-1, 1] full scale, set bit i (big-endian) iff window i's
    * energy exceeds the mean of window energies. Robust to
    * re-encoding, level-preserving trims, and sample-rate-preserving
    * copies; featureless audio (digital silence, constant tone) hashes
    * to 0 — the same degeneracy solid-color images have under aHash.
    * None for undecodable payloads or clips shorter than 64 frames.
    * Same PCM subset as [[decodeWav]] (8/16-bit, either endianness).
    */
  def audioEnvelopeHash(payload: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ok =
          (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) &&
            (bits == 8 || bits == 16)
        if (!ok) None
        else {
          val channels = fmt.getChannels
          val bytesPer = bits / 8
          val frameSize = fmt.getFrameSize
          val big = fmt.isBigEndian
          val unsigned =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bytes = ais.readAllBytes()
          val nFrames = bytes.length.toLong / frameSize
          if (nFrames < 64) None
          else {
            val sums = new Array[Double](64)
            val counts = new Array[Long](64)
            var f = 0L
            while (f < nFrames) {
              val base = (f * frameSize).toInt
              var mix = 0.0
              var c = 0
              while (c < channels) {
                val o = base + c * bytesPer
                val v =
                  if (bits == 8) {
                    val raw =
                      if (unsigned) (bytes(o) & 0xff) - 128 else bytes(o).toInt
                    raw / 128.0
                  } else {
                    val (lo, hi) = if (big) (o + 1, o) else (o, o + 1)
                    val raw =
                      ((bytes(hi).toInt << 8) | (bytes(lo) & 0xff)).toShort
                    val centered = if (unsigned) raw - 32768 else raw.toInt
                    centered / 32768.0
                  }
                mix += v
                c += 1
              }
              val w = (f * 64L / nFrames).toInt
              sums(w) += math.abs(mix / channels)
              counts(w) += 1
              f += 1
            }
            var i = 0
            var tot = 0.0
            while (i < 64) { sums(i) /= counts(i); tot += sums(i); i += 1 }
            val mean = tot / 64.0
            var out = 0L
            i = 0
            while (i < 64) {
              if (sums(i) > mean) out |= (1L << (63 - i))
              i += 1
            }
            Some(out)
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  case class AudioHash(doc_id: Long, hash: Long)

  /** The [[audioEnvelopeHash]] signatures of a media table, through
    * the same `mapPartitions` codec seam.
    */
  def audioHashes(spark: SparkSession, media: DataFrame): Dataset[AudioHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap(r =>
        audioEnvelopeHash(r.payload).map(AudioHash(r.doc_id, _))))
  }

  /** X5c: audio near-dup pairs — [[hammingNearDup]] over
    * [[audioEnvelopeHash]] signatures.
    */
  def audioNearDup(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 5): DataFrame =
    hammingNearDup(audioHashes(spark, media).toDF(), maxHamming)

  case class AudioFeatures(
      doc_id: Long, mime: String, sample_rate: Double, channels: Int,
      n_frames: Long, duration_sec: Double, rms: Seq[Double])

  /** REAL audio decode via `javax.sound.sampled` — pure JVM, present
    * in every stock JDK, no native codec — the audio counterpart of
    * [[decodePng]]: the SAME magic-byte dispatch idea (the WAV/AIFF/AU
    * reader is chosen from the payload's own header) through the same
    * keep-or-drop contract. Decodes PCM WAV (8-bit signed/unsigned,
    * 16-bit either endianness) and returns (sampleRate, channels,
    * nFrames, duration seconds, per-channel RMS on the [-1, 1]
    * full-scale) — the features an audio curation pass filters on
    * (silence/clipping detection, duration budgeting). None for
    * payloads that are not decodable audio.
    */
  def decodeWav(
      payload: Array[Byte]): Option[(Double, Int, Long, Double, Seq[Double])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ok =
          (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) &&
            (bits == 8 || bits == 16)
        if (!ok) None
        else {
          val channels = fmt.getChannels
          val bytesPer = bits / 8
          val frameSize = fmt.getFrameSize
          val big = fmt.isBigEndian
          val unsigned =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bytes = ais.readAllBytes()
          val nFrames = bytes.length.toLong / frameSize
          val sumSq = new Array[Double](channels)
          var f = 0L
          while (f < nFrames) {
            val base = (f * frameSize).toInt
            var c = 0
            while (c < channels) {
              val o = base + c * bytesPer
              val v =
                if (bits == 8) {
                  val raw = if (unsigned) (bytes(o) & 0xff) - 128 else bytes(o).toInt
                  raw / 128.0
                } else {
                  val (lo, hi) = if (big) (o + 1, o) else (o, o + 1)
                  val raw = ((bytes(hi).toInt << 8) | (bytes(lo) & 0xff)).toShort
                  val centered = if (unsigned) raw - 32768 else raw.toInt
                  centered / 32768.0
                }
              sumSq(c) += v * v
              c += 1
            }
            f += 1
          }
          val rms = sumSq.toSeq.map(s =>
            if (nFrames == 0) 0.0 else math.sqrt(s / nFrames))
          val rate = fmt.getSampleRate.toDouble
          Some((rate, channels, nFrames,
            if (rate == 0) 0.0 else nFrames / rate, rms))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Audio feature extraction over the media table — the same
    * partition-batched shape as [[extractImageFeatures]] with the REAL
    * WAV decoder in the hot seat; undecodable rows are dropped. The
    * variable-length `rms` seq (one entry per channel) rides the
    * Dataset encoder as an array column — per-channel stats stay
    * queryable with `element_at`/`aggregate` downstream.
    */
  def extractAudioFeatures(
      spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init seam (codec/model handle would go here)
        it.flatMap { r =>
          decodeWav(r.payload).map { case (rate, ch, nf, dur, rms) =>
            AudioFeatures(r.doc_id, r.mime, rate, ch, nf, dur, rms)
          }
        }
      }
  }

  /** STUB — "resize": deterministic byte-domain downsample to
    * `targetBytes` (stride sampling). A real deployment decodes,
    * resizes pixels, re-encodes; the Spark shape — narrow
    * binary→binary map with bounded output size — is identical.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      val stride = payload.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) { out(i) = payload((i * stride).toInt); i += 1 }
      out
    }

  case class MediaFrame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  case class FrameFeatures(
      doc_id: Long, frame_no: Int, width: Int, height: Int,
      avg_r: Double, avg_g: Double, avg_b: Double)

  /** REAL frame sampling: every `everyN`-th decoded frame of each
    * payload's animation (GIF via the stock JDK reader), one feature
    * row per sampled frame — the video-frame-extraction shape
    * ([[sampleFrames]]'s byte-slicing stub) with an actual multi-frame
    * codec in the hot seat. Same UDTF-shaped one-to-many flatMap,
    * same per-partition init, undecodable rows dropped.
    */
  def sampleFrameImages(spark: SparkSession, media: DataFrame,
      everyN: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(everyN >= 1, "everyN must be >= 1")
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition init
        it.flatMap { r =>
          decodeFrames(r.payload)
            .filter { case (f, _, _, _, _, _) => f % everyN == 0 }
            .map { case (f, w, h, ar, ag, ab) =>
              FrameFeatures(r.doc_id, f, w, h, ar, ag, ab)
            }
        }
      }
  }

  /** STUB — "frame sampling": one fixed-size frame every `frameBytes`
    * of payload (stands in for video frame extraction; a UDTF-shaped
    * one-to-many flatMap — the row-multiplying plumbing is the real
    * part, the slicing is the fake decode).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int, everyN: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .flatMap { r =>
        val nFrames = math.max(1, r.payload.length / frameBytes)
        (0 until nFrames by everyN).map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          MediaFrame(r.doc_id, f, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
  }
}
