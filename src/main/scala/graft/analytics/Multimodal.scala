package graft.analytics

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio as opaque BINARY columns with
  * typed metadata, decoded/feature-extracted in distributed batches.
  *
  * The decode is REAL: PNG bytes go through `javax.imageio` (the JDK's
  * actual PNG codec) and WAV bytes through a RIFF/WAVE header parser. The
  * Spark-side shape is what matters at 100 TB: binary columns travel as
  * Tungsten byte arrays; decode runs via `mapPartitions` on a typed Dataset
  * (one JVM call per partition, amortizing codec init, exactly where a
  * JNI/FFI decoder for formats the JDK lacks — jpeg2000, h264 — would sit);
  * output is a typed row, never a driver-side collect.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      kind: String,
      width: Long,
      height: Long,
      channels: Long,
      frames: Long,
      sample_rate: Long)

  /** Real encoders/decoders over JDK-native formats. Deterministic: the same
    * doc_id always synthesizes byte-identical media.
    */
  object Codecs {
    // ImageIO's disk cache is a per-call tmp-file — disable it on executors
    ImageIO.setUseCache(false)

    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          // cheap deterministic texture so the compressor has real work
          img.setRGB(x, y, (((x * 31 + y * 17 + seed) * 2654435761L) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decodePng(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(s"doc $docId: not a decodable image")
      MediaMeta(docId, "png", img.getWidth.toLong, img.getHeight.toLong,
        img.getRaster.getNumBands.toLong, 1L, 0L)
    }

    /** Canonical 44-byte PCM WAV header + silence frames. */
    def encodeWav(channels: Int, sampleRate: Int, frames: Int): Array[Byte] = {
      val bitsPerSample = 16
      val blockAlign = channels * bitsPerSample / 8
      val dataSize = frames * blockAlign
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * blockAlign)
        .putShort(blockAlign.toShort)
        .putShort(bitsPerSample.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      buf.array()
    }

    def decodeWav(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(n: Int): String = {
        val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
      }
      if (ascii(4) != "RIFF")
        throw new IllegalArgumentException(s"doc $docId: not RIFF")
      buf.getInt // chunk size
      if (ascii(4) != "WAVE")
        throw new IllegalArgumentException(s"doc $docId: not WAVE")
      var channels = 0L
      var sampleRate = 0L
      var blockAlign = 0L
      var dataSize = -1L
      while (dataSize < 0 && buf.remaining() >= 8) {
        val id = ascii(4)
        val sz = buf.getInt
        id match {
          case "fmt " =>
            val start = buf.position()
            buf.getShort // audio format
            channels = buf.getShort.toLong
            sampleRate = buf.getInt.toLong
            buf.getInt // byte rate
            blockAlign = buf.getShort.toLong
            buf.position(start + sz)
          case "data" => dataSize = sz.toLong
          case _ => buf.position(buf.position() + sz) // skip unknown chunk
        }
      }
      if (dataSize < 0 || blockAlign == 0)
        throw new IllegalArgumentException(s"doc $docId: no data/fmt chunk")
      MediaMeta(docId, "wav", 0L, 0L, channels, dataSize / blockAlign,
        sampleRate)
    }

    /** Container sniffing by magic bytes, like a real ingest path. */
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta =
      if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P')
        decodePng(docId, bytes)
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I')
        decodeWav(docId, bytes)
      else throw new IllegalArgumentException(
        s"doc $docId: unrecognized media container")
  }

  /** The parameters each doc's media is synthesized with — pure doc_id
    * arithmetic, so an oracle can predict what a correct decode recovers.
    */
  def synthesize(docId: Long): Array[Byte] =
    if (docId % 2 == 0)
      Codecs.encodePng(
        width = (docId % 97 + 8).toInt,
        height = (docId * 3 % 71 + 8).toInt,
        seed = docId)
    else
      Codecs.encodeWav(
        channels = (docId % 3 + 1).toInt,
        sampleRate = (8000 + docId % 4 * 4000).toInt,
        frames = (docId % 500 + 1).toInt)

  /** Near-dup image synthesis for the perceptual-hash dedup path: even
    * doc_ids form groups of four (`base = doc_id - doc_id % 8`) that share
    * one base texture and dimensions, with a per-variant brightness jitter
    * on the pixel diagonal band `(x + y) % 23 == variant` (+16 per channel,
    * clamped) — the "same image, re-encoded slightly differently" case
    * every crawled image corpus is full of. Pure doc_id arithmetic, so the
    * oracle can predict each variant's exact pixels.
    */
  def synthesizeNearDupPng(docId: Long): Array[Byte] = {
    val base = docId - docId % 8
    val variant = ((docId % 8) / 2).toInt
    val width = (base % 97 + 8).toInt
    val height = (base * 3 % 71 + 8).toInt
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (((x * 31 + y * 17 + base) * 2654435761L) & 0xFFFFFF).toInt
        val rgb = if ((x + y) % 23 == variant) {
          val r = math.min(((v >> 16) & 0xFF) + 16, 255)
          val g = math.min(((v >> 8) & 0xFF) + 16, 255)
          val b = math.min((v & 0xFF) + 16, 255)
          (r << 16) | (g << 8) | b
        } else v
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Near-dup audio synthesis — [[synthesizeNearDupPng]]'s WAV twin: odd
    * doc_ids form groups of four (`base = doc_id - doc_id % 8 + 1`) sharing
    * one base waveform (mono 16-bit PCM, `base % 200 + 64` frames), with a
    * per-variant gain bump on every 23rd sample (+512 clamped to 32767) —
    * the "same recording, slightly re-mastered" case. Pure doc_id
    * arithmetic, so the oracle predicts each variant's exact samples.
    */
  def synthesizeNearDupWav(docId: Long): Array[Byte] = {
    val base = docId - docId % 8 + 1
    val variant = ((docId % 8) / 2).toInt
    val n = (base % 200 + 64).toInt
    val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000 * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      val raw = (((i * 131L + base * 97L) * 2654435761L) & 0x7FFFL).toInt
      val amp = if (i % 23 == variant) math.min(raw + 512, 32767) else raw
      buf.putShort(amp.toShort)
      i += 1
    }
    buf.array()
  }

  final case class AudioHash(doc_id: Long, ehash: Long)

  /** Energy hash — [[aHashOf]]'s audio twin: real RIFF/WAVE chunk walk,
    * then 64 samples at `w * frames / 64`, bit w set iff
    * `64 * amp_w > sum(amps)` (the same integer-exact mean threshold — no
    * float anywhere, so the oracle reproduces it bit-for-bit). 64 samples
    * read per clip regardless of length.
    */
  def eHashOf(docId: Long, media: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(media)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    if (ascii(4) != "RIFF") throw new IllegalArgumentException(s"doc $docId: not RIFF")
    buf.getInt
    if (ascii(4) != "WAVE") throw new IllegalArgumentException(s"doc $docId: not WAVE")
    var dataStart = -1
    var frames = 0
    while (dataStart < 0 && buf.remaining() >= 8) {
      val id = ascii(4)
      val size = buf.getInt
      if (id == "data") {
        dataStart = buf.position()
        frames = size / 2 // mono 16-bit
      } else buf.position(buf.position() + size + (size & 1))
    }
    require(dataStart >= 0 && frames >= 64, s"doc $docId: no usable data chunk")
    val amps = new Array[Int](64)
    var total = 0L
    var w = 0
    while (w < 64) {
      val idx = (w.toLong * frames / 64).toInt
      amps(w) = buf.getShort(dataStart + idx * 2).toInt
      total += amps(w)
      w += 1
    }
    var hash = 0L
    w = 0
    while (w < 64) {
      if (64L * amps(w) > total) hash |= 1L << w
      w += 1
    }
    hash
  }

  def audioEHash(media: Dataset[MediaRecord]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => AudioHash(r.doc_id, eHashOf(r.doc_id, r.media))))
  }

  /** Near-dup video synthesis — the GVID twin of [[synthesizeNearDupPng]]:
    * doc_ids form groups of four (`base = doc_id - doc_id % 4`) sharing one
    * base clip (dims and frame count from `base`), with a per-variant
    * brightness bump on the spatio-temporal band `(x + y + f) % 23 ==
    * variant` (+8 per channel, clamped at the encoder's mod-251 ceiling) —
    * "same clip, re-encoded slightly differently". Pure doc_id arithmetic,
    * so the oracle predicts each variant's exact bytes.
    */
  def synthesizeNearDupVideo(docId: Long): Array[Byte] = {
    val base = docId - docId % 4
    val variant = (docId % 4).toInt
    val width = (base % 13 + 4).toInt
    val height = (base % 11 + 4).toInt
    val nframes = (base % 50 + 12).toInt
    val bb = java.nio.ByteBuffer.allocate(20 + width * height * 3 * nframes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
    bb.putInt(width).putInt(height).putInt(6).putInt(nframes)
    var f = 0
    while (f < nframes) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          var c = 0
          while (c < 3) {
            val v = ((x * 131L + y * 241L + f * 37L + base * 97L + c * 59L)
              % 251L).toInt
            val jittered =
              if ((x + y + f) % 23 == variant) math.min(v + 8, 250) else v
            bb.put(jittered.toByte)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      f += 1
    }
    bb.array()
  }

  final case class VideoHash(doc_id: Long, vhash: Long)

  /** Video perceptual hash — [[aHashOf]] extended along time: parse the
    * GVID header, sample 64 (frame, x, y) points on an 8×8 spatial grid
    * walked through the clip (`f = i * nframes / 64`), per-point
    * brightness r+g+b, bit i set iff `64 * v_i > sum(v)` (the same
    * integer-exact mean threshold). 64 pixels read per clip regardless of
    * length or resolution.
    */
  def vHashOf(docId: Long, media: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(media)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'G' && bb.get() == 'V' && bb.get() == 'I' &&
      bb.get() == 'D', s"doc $docId: not GVID")
    val w = bb.getInt; val h = bb.getInt; bb.getInt // fps unused
    val n = bb.getInt
    require(w > 0 && h > 0 && n > 0 &&
      media.length >= 20 + w * h * 3 * n, s"doc $docId: truncated container")
    val v = new Array[Int](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      val f = (i.toLong * n / 64).toInt
      val x = (i % 8) * w / 8
      val y = (i / 8) * h / 8
      val off = 20 + ((f.toLong * h + y) * w + x).toInt * 3
      v(i) = (media(off) & 0xFF) + (media(off + 1) & 0xFF) +
        (media(off + 2) & 0xFF)
      total += v(i)
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (64L * v(i) > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  def videoVHash(media: Dataset[MediaRecord]): Dataset[VideoHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => VideoHash(r.doc_id, vHashOf(r.doc_id, r.media))))
  }

  final case class ImageHash(doc_id: Long, ahash: Long)

  /** Perceptual hash (aHash): decode the real PNG, 8×8 nearest-neighbor
    * thumbnail, per-cell brightness `r+g+b`, bit i set iff
    * `64 * gray_i > sum(gray)` (integer-exact mean threshold — no float
    * anywhere, so the oracle reproduces it bit-for-bit). Per-partition
    * batch like [[imageFeatures]]; 64 pixels read per image regardless of
    * size.
    */
  def aHashOf(docId: Long, media: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(media))
    if (img == null)
      throw new IllegalArgumentException(s"doc $docId: not an image")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = new Array[Int](64)
    var total = 0
    var i = 0
    while (i < 64) {
      val v = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8) & 0xFFFFFF
      gray(i) = ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
      total += gray(i)
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (64 * gray(i) > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  def imageAHash(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => ImageHash(r.doc_id, aHashOf(r.doc_id, r.media))))
  }

  /** Deterministic raw-RGB video container (`GVID` + LE width/height/fps/
    * frame-count header, then frame-major w×h×3 byte planes). The JDK has no
    * video codec, so the container IS this library's — but the parsing,
    * frame addressing and per-frame math below are real, and sit exactly
    * where an FFI h264 decoder would (per-partition batch, bytes → typed
    * stats). Pixel bytes are pure doc_id arithmetic so the oracle can
    * predict what a correct frame-sample recovers.
    */
  def encodeVideo(width: Int, height: Int, fps: Int, nframes: Int,
      seed: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(20 + width * height * 3 * nframes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
    bb.putInt(width).putInt(height).putInt(fps).putInt(nframes)
    var f = 0
    while (f < nframes) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          var c = 0
          while (c < 3) {
            bb.put(((x * 131L + y * 241L + f * 37L + seed * 97L + c * 59L)
              % 251L).toByte)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      f += 1
    }
    bb.array()
  }

  def synthesizeVideo(docId: Long): Array[Byte] =
    encodeVideo(
      width = (docId % 13 + 4).toInt,
      height = (docId % 11 + 4).toInt,
      fps = ((docId % 3 + 1) * 6).toInt,
      nframes = (docId % 50 + (docId % 3 + 1) * 6).toInt,
      seed = docId)

  final case class VideoStats(
      doc_id: Long, n_frames: Long, n_sampled: Long, bright_sum: Long)

  /** Frame-sampling operator: parse the container header, touch ONE frame
    * per second of video (frames 0, fps, 2·fps, …) and reduce each to a
    * brightness sum — the standard "sample k frames for the vision encoder"
    * preprocessing. Only sampled frames are read; the rest of the byte
    * array is never touched, which is the point at 100 TB of video.
    */
  def videoFrameSample(media: Dataset[MediaRecord]): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val bb = java.nio.ByteBuffer.wrap(r.media)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        require(bb.get() == 'G' && bb.get() == 'V' && bb.get() == 'I' &&
          bb.get() == 'D', s"doc ${r.doc_id}: not a GVID container")
        val w = bb.getInt
        val h = bb.getInt
        val fps = bb.getInt
        val n = bb.getInt
        // this parse is the FFI-decoder seam: a hostile/corrupt header must
        // fail typed, not spin (fps=0 → infinite loop) or throw
        // ArrayIndexOutOfBounds per-row (undersized payload)
        require(fps > 0, s"doc ${r.doc_id}: fps must be positive, got $fps")
        require(w > 0 && h > 0 && n >= 0,
          s"doc ${r.doc_id}: bad GVID dims ${w}x${h}x$n")
        require(r.media.length >= 20L + w.toLong * h * 3L * n,
          s"doc ${r.doc_id}: GVID payload shorter than declared ${w}x${h}x$n")
        val frameBytes = w * h * 3
        var sum = 0L
        var sampled = 0L
        var f = 0
        while (f < n) {
          val base = 20 + f * frameBytes
          var i = 0
          while (i < frameBytes) {
            sum += (r.media(base + i) & 0xFF).toLong
            i += 1
          }
          sampled += 1
          f += fps
        }
        VideoStats(r.doc_id, n.toLong, sampled, sum)
      }
    }
  }

  /** The batch-decode operator: one decoder invocation pipeline per
    * partition (the shape a vectorized/native decoder needs).
    */
  def decodeBatch(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init would go here (codec contexts, model handles)
      batch.map(r => Codecs.decode(r.doc_id, r.media))
    }
  }

  /** doc_id + 8×8 nearest-neighbor thumbnail channel sums. */
  final case class MediaFeatures(
      doc_id: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decode → resize (8×8 nearest-neighbor) → feature-extract (per-channel
    * sums), the standard image-embedding preprocessing shape: the resize
    * reads exactly 64 pixels per image THROUGH the real decoder, so the
    * features depend on the decode being faithful, and the whole stage is a
    * per-partition batch (where a vectorized resize kernel would sit).
    */
  def imageFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.media))
        if (img == null)
          throw new IllegalArgumentException(s"doc ${r.doc_id}: not an image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            // nearest-neighbor sample: src = floor(g * dim / 8)
            val v = img.getRGB(gx * w / 8, gy * h / 8) & 0xFFFFFF
            sr += (v >> 16) & 0xFF
            sg += (v >> 8) & 0xFF
            sb += v & 0xFF
            gx += 1
          }
          gy += 1
        }
        MediaFeatures(r.doc_id, sr, sg, sb)
      }
    }
  }

  /** doc_id + ViT patch index (row-major 4×4) + patch brightness sum. */
  final case class PatchStats(doc_id: Long, patch_id: Long, bright: Long)

  /** ViT-style patch extraction: decode → the same 8×8 nearest-neighbor
    * sample grid as [[imageFeatures]], regrouped into the 4×4 patch grid a
    * vision transformer's preprocessor emits (each patch = a 2×2 block of
    * grid samples, patch_id row-major — the flattening that position
    * embeddings index). Per-partition batch like every decode stage; only
    * 64 pixels per image cross the decoder.
    */
  def imagePatches(media: Dataset[MediaRecord]): Dataset[PatchStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.media))
        if (img == null)
          throw new IllegalArgumentException(s"doc ${r.doc_id}: not an image")
        val (w, h) = (img.getWidth, img.getHeight)
        for (py <- 0 until 4; px <- 0 until 4) yield {
          var s = 0L
          var sy = 0
          while (sy < 2) {
            var sx = 0
            while (sx < 2) {
              val gx = px * 2 + sx
              val gy = py * 2 + sy
              val v = img.getRGB(gx * w / 8, gy * h / 8) & 0xFFFFFF
              s += ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
              sx += 1
            }
            sy += 1
          }
          PatchStats(r.doc_id, (py * 4 + px).toLong, s)
        }
      }
    }
  }

  val queries: Map[String, Relational.Q] = Map(
    // Binary-column pipeline: synthesize real PNG/WAV bytes per document
    // (executor-side, deterministic), decode them back with the real codecs,
    // aggregate the recovered metadata. The oracle predicts the same numbers
    // from the synthesis arithmetic — green means the decode actually
    // recovered what the encoder wrote.
    "m1_media_decode" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaRecord(id, synthesize(id))))
      decodeBatch(media).toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("width")).as("sum_width"),
          sum(col("height")).as("sum_height"),
          sum(col("channels")).as("sum_channels"),
          sum(col("frames")).as("sum_frames"),
          max(col("sample_rate")).as("max_rate"))
    },

    // Decode → resize → feature-extract over the image subset: 8×8
    // nearest-neighbor thumbnails through the REAL PNG decoder, per-channel
    // sums bucketed by doc_id % 10. The oracle recomputes the exact sums
    // from the synthesis arithmetic (pixel = ((x*31 + y*17 + seed) *
    // 2654435761) & 0xFFFFFF at the sampled coordinates) — green means
    // decode + resize read back precisely the pixels the encoder wrote.
    // Video frame-sampling: deterministic GVID containers per doc, one
    // frame touched per second of video, per-frame brightness reduced and
    // bucket-aggregated. The oracle replays the synthesis arithmetic at
    // exactly the sampled (frame, x, y, channel) points — green means the
    // sampler addressed precisely the frames the encoder wrote.
    "m3_video_frames" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaRecord(id, synthesizeVideo(id))))
      videoFrameSample(media).toDF()
        .groupBy(pmod(col("doc_id"), lit(10L)).as("bucket"))
        .agg(count(lit(1)).as("n_videos"),
          sum(col("n_frames")).as("sum_frames"),
          sum(col("n_sampled")).as("sum_sampled"),
          sum(col("bright_sum")).as("sum_brightness"))
    },

    "m2_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id")).as[Long]
        .filter(_ % 2 == 0) // the PNG half of the corpus
        .mapPartitions(_.map(id => MediaRecord(id, synthesize(id))))
      imageFeatures(media).toDF()
        .groupBy(pmod(col("doc_id"), lit(10L)).as("bucket"))
        .agg(count(lit(1)).as("n_imgs"),
          sum(col("sum_r")).as("sum_r"),
          sum(col("sum_g")).as("sum_g"),
          sum(col("sum_b")).as("sum_b"))
    },

    // ViT patch grid positional statistics — per patch position across the
    // corpus: image count and brightness mass. These are the per-position
    // normalization stats a vision-encoder preprocessing pipeline computes
    // before training (and the oracle proves the patch FLATTENING is
    // right: every patch_id's sum must equal the synthesis arithmetic for
    // exactly its 2×2 grid block, so a transposed or offset patch order —
    // the classic ViT preprocessing bug — cannot pass). One decode pass,
    // map-side-combined 16-key agg, zero joins.
    "m7_image_patches" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id")).as[Long]
        .filter(_ % 2 == 0) // the PNG half of the corpus
        .mapPartitions(_.map(id => MediaRecord(id, synthesize(id))))
      imagePatches(media).toDF()
        .groupBy(col("patch_id"))
        .agg(count(lit(1)).as("n_imgs"),
          sum(col("bright")).as("sum_bright"))
    },

    // Perceptual-hash image dedup: real PNG bytes (planted near-dup groups
    // of 4, see synthesizeNearDupPng) → real decode → aHash → 4×16-bit
    // band LSH → hamming ≤ 16 pairs. The multimodal twin of d3/d4: the
    // corpus-sized hash table self-joins only on band collisions (never
    // all pairs), the joins are shuffle-hinted (corpus-unbounded sides),
    // and the hamming check touches candidates only. The oracle replays
    // the synthesis+thumbnail+threshold arithmetic exactly — green means
    // the decode→hash→band→pair pipeline recovered precisely the planted
    // near-dup structure.
    "m4_image_dedup" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id")).as[Long]
        .filter(_ % 2 == 0) // the PNG half of the corpus
        .mapPartitions(_.map(id => MediaRecord(id, synthesizeNearDupPng(id))))
      val hashes = imageAHash(media).toDF()
      val bands = hashes.select(col("doc_id"), col("ahash"),
        explode(sequence(lit(0), lit(3))).as("b"))
        .select(col("doc_id"), col("ahash"), col("b"),
          expr("shiftrightunsigned(ahash, 16 * b)")
            .bitwiseAND(lit(0xFFFFL)).as("bv"))
      val cand = bands.select(col("b"), col("bv"),
          col("doc_id").as("doc_a"), col("ahash").as("ha"))
        .join(bands.select(col("b"), col("bv"),
          col("doc_id").as("doc_b"), col("ahash").as("hb"))
          .hint("shuffle_hash"), Seq("b", "bv"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
        .distinct() // a pair may collide in several bands
      cand
        .withColumn("hamming",
          expr("bit_count(ha ^ hb)").cast("long"))
        .filter(col("hamming") <= 16)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    },

    // m4's video twin: GVID container parse → 64 (frame, x, y) sample
    // points → the same mean-threshold hash, band LSH and hamming verify.
    "m6_video_dedup" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaRecord(id, synthesizeNearDupVideo(id))))
      val hashes = videoVHash(media).toDF()
      val bands = hashes.select(col("doc_id"), col("vhash"),
        explode(sequence(lit(0), lit(3))).as("b"))
        .select(col("doc_id"), col("vhash"), col("b"),
          expr("shiftrightunsigned(vhash, 16 * b)")
            .bitwiseAND(lit(0xFFFFL)).as("bv"))
      val cand = bands.select(col("b"), col("bv"),
          col("doc_id").as("doc_a"), col("vhash").as("ha"))
        .join(bands.select(col("b"), col("bv"),
          col("doc_id").as("doc_b"), col("vhash").as("hb"))
          .hint("shuffle_hash"), Seq("b", "bv"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
        .distinct() // a pair may collide in several bands
      cand
        .withColumn("hamming",
          expr("bit_count(ha ^ hb)").cast("long"))
        .filter(col("hamming") <= 16)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    },

    // m4's audio twin: real WAV decode → 64-point energy hash → the same
    // 4×16-bit band LSH → hamming pairs on band collisions only. With
    // images (m4), text (d3), and embeddings (d5) this closes the
    // modality-dedup family — every shape is the same scalable band-join
    // skeleton with a modality-specific fingerprint in front.
    "m5_audio_dedup" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id")).as[Long]
        .filter(_ % 2 == 1) // the WAV half of the corpus
        .mapPartitions(_.map(id => MediaRecord(id, synthesizeNearDupWav(id))))
      val hashes = audioEHash(media).toDF()
      val bands = hashes.select(col("doc_id"), col("ehash"),
        explode(sequence(lit(0), lit(3))).as("b"))
        .select(col("doc_id"), col("ehash"), col("b"),
          expr("shiftrightunsigned(ehash, 16 * b)")
            .bitwiseAND(lit(0xFFFFL)).as("bv"))
      val cand = bands.select(col("b"), col("bv"),
          col("doc_id").as("doc_a"), col("ehash").as("ha"))
        .join(bands.select(col("b"), col("bv"),
          col("doc_id").as("doc_b"), col("ehash").as("hb"))
          .hint("shuffle_hash"), Seq("b", "bv"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
        .distinct() // a pair may collide in several bands
      cand
        .withColumn("hamming",
          expr("bit_count(ha ^ hb)").cast("long"))
        .filter(col("hamming") <= 16)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    })

  val oracles: Map[String, String] = Map(
    // Mirrors `synthesize`'s doc_id arithmetic — what a correct decode must
    // recover from the actual PNG/WAV bytes.
    "m1_media_decode" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS kind,
        |    CASE WHEN doc_id % 2 = 0 THEN doc_id % 97 + 8 ELSE 0 END AS width,
        |    CASE WHEN doc_id % 2 = 0 THEN doc_id * 3 % 71 + 8 ELSE 0 END AS height,
        |    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE doc_id % 3 + 1 END AS channels,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE doc_id % 500 + 1 END AS frames,
        |    CASE WHEN doc_id % 2 = 0 THEN 0
        |         ELSE 8000 + doc_id % 4 * 4000 END AS sample_rate
        |  FROM documents)
        |SELECT kind, COUNT(*) AS n,
        |  CAST(SUM(width) AS BIGINT) AS sum_width,
        |  CAST(SUM(height) AS BIGINT) AS sum_height,
        |  CAST(SUM(channels) AS BIGINT) AS sum_channels,
        |  CAST(SUM(frames) AS BIGINT) AS sum_frames,
        |  CAST(MAX(sample_rate) AS BIGINT) AS max_rate
        |FROM meta GROUP BY 1""".stripMargin,
    // The GVID synthesis arithmetic replayed at the sampled points only:
    // frames k*fps < n, pixel byte = (x*131 + y*241 + f*37 + doc_id*97 +
    // c*59) % 251, sampled count = ceil(n / fps).
    "m3_video_frames" ->
      """WITH vids AS (
        |  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h,
        |    (doc_id % 3 + 1) * 6 AS fps,
        |    doc_id % 50 + (doc_id % 3 + 1) * 6 AS n
        |  FROM documents),
        |sampled AS (
        |  SELECT v.doc_id, v.w, v.h, v.fps, k.v * v.fps AS f
        |  FROM vids v, (SELECT unnest(range(0, 16)) AS v) k
        |  WHERE k.v * v.fps < v.n),
        |px AS (
        |  SELECT s.doc_id,
        |    (x.v * 131 + y.v * 241 + s.f * 37 + s.doc_id * 97 + c.v * 59)
        |      % 251 AS b
        |  FROM sampled s,
        |       (SELECT unnest(range(0, 17)) AS v) x,
        |       (SELECT unnest(range(0, 15)) AS v) y,
        |       (SELECT unnest(range(0, 3)) AS v) c
        |  WHERE x.v < s.w AND y.v < s.h),
        |bright AS (SELECT doc_id, CAST(SUM(b) AS BIGINT) AS bright
        |           FROM px GROUP BY doc_id),
        |stats AS (SELECT doc_id, n,
        |            CAST((n + fps - 1) // fps AS BIGINT) AS k_cnt
        |          FROM vids)
        |SELECT s.doc_id % 10 AS bucket, COUNT(*) AS n_videos,
        |  CAST(SUM(s.n) AS BIGINT) AS sum_frames,
        |  CAST(SUM(s.k_cnt) AS BIGINT) AS sum_sampled,
        |  CAST(SUM(b.bright) AS BIGINT) AS sum_brightness
        |FROM stats s JOIN bright b USING (doc_id) GROUP BY 1""".stripMargin,
    // The near-dup synthesis + thumbnail + integer mean-threshold replayed
    // exactly: per-cell bit iff 64*gray > total, band value = 16-bit slice
    // reassembled from bits, pairs via band equality, hamming as the
    // per-index bit disagreement count (identical to the Spark side's
    // bit_count(ha ^ hb) by construction — no 64-bit value ever needs to
    // exist on the SQL side).
    "m4_image_dedup" ->
      """WITH imgs AS (
        |  SELECT doc_id, doc_id - doc_id % 8 AS base, (doc_id % 8) // 2 AS var
        |  FROM documents WHERE doc_id % 2 = 0),
        |dims AS (SELECT doc_id, base, var, base % 97 + 8 AS w,
        |           base * 3 % 71 + 8 AS h
        |         FROM imgs),
        |grid AS (SELECT gx.v AS gx, gy.v AS gy
        |         FROM (SELECT unnest(range(0, 8)) AS v) gx,
        |              (SELECT unnest(range(0, 8)) AS v) gy),
        |pxl AS (
        |  SELECT doc_id, gy * 8 + gx AS idx,
        |    (gx * w) // 8 AS sx, (gy * h) // 8 AS sy, var,
        |    (((gx * w) // 8 * 31 + (gy * h) // 8 * 17 + base) * 2654435761)
        |      & 16777215 AS px
        |  FROM dims CROSS JOIN grid),
        |gray AS (
        |  SELECT doc_id, idx,
        |    CASE WHEN (sx + sy) % 23 = var
        |      THEN LEAST(((px >> 16) & 255) + 16, 255)
        |         + LEAST(((px >> 8) & 255) + 16, 255)
        |         + LEAST((px & 255) + 16, 255)
        |      ELSE ((px >> 16) & 255) + ((px >> 8) & 255) + (px & 255)
        |    END AS g
        |  FROM pxl),
        |tot AS (SELECT doc_id, SUM(g) AS t FROM gray GROUP BY doc_id),
        |bits AS (SELECT g.doc_id, g.idx,
        |           CASE WHEN 64 * g.g > t.t THEN 1 ELSE 0 END AS bit
        |         FROM gray g JOIN tot t USING (doc_id)),
        |bands AS (SELECT doc_id, idx // 16 AS b,
        |            CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS bv
        |          FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
        |           AND a.doc_id < b.doc_id),
        |ham AS (SELECT c.doc_a, c.doc_b,
        |          CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)
        |            AS BIGINT) AS hamming
        |        FROM cand c
        |        JOIN bits x ON c.doc_a = x.doc_id
        |        JOIN bits y ON c.doc_b = y.doc_id AND x.idx = y.idx
        |        GROUP BY 1, 2)
        |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 16""".stripMargin,
    // m6: the GVID synthesis + 64-point spatio-temporal hash replayed
    // exactly — f = (i*n)//64, grid x/y as in m4, per-channel byte =
    // (x*131 + y*241 + f*37 + base*97 + c*59) % 251, +8-clamped on
    // (x+y+f) % 23 == variant, mean-threshold bits, m4's band mechanics.
    "m6_video_dedup" ->
      """WITH vids AS (
        |  SELECT doc_id, doc_id - doc_id % 4 AS base, doc_id % 4 AS var
        |  FROM documents),
        |dims AS (SELECT doc_id, base, var, base % 13 + 4 AS w,
        |           base % 11 + 4 AS h, base % 50 + 12 AS n
        |         FROM vids),
        |pts AS (SELECT v AS i FROM (SELECT unnest(range(0, 64)) AS v)),
        |coords AS (
        |  SELECT doc_id, base, var, pts.i AS idx,
        |    ((pts.i % 8) * w) // 8 AS x, ((pts.i // 8) * h) // 8 AS y,
        |    (pts.i * n) // 64 AS f
        |  FROM dims CROSS JOIN pts),
        |chan AS (SELECT c.v AS c FROM (SELECT unnest(range(0, 3)) AS v) c),
        |px AS (
        |  SELECT doc_id, idx,
        |    CASE WHEN (x + y + f) % 23 = var
        |      THEN LEAST((x * 131 + y * 241 + f * 37 + base * 97 + c * 59)
        |                   % 251 + 8, 250)
        |      ELSE (x * 131 + y * 241 + f * 37 + base * 97 + c * 59) % 251
        |    END AS v
        |  FROM coords CROSS JOIN chan),
        |gray AS (SELECT doc_id, idx, SUM(v) AS g FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, SUM(g) AS t FROM gray GROUP BY doc_id),
        |bits AS (SELECT g.doc_id, g.idx,
        |           CASE WHEN 64 * g.g > t.t THEN 1 ELSE 0 END AS bit
        |         FROM gray g JOIN tot t USING (doc_id)),
        |bands AS (SELECT doc_id, idx // 16 AS b,
        |            CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS bv
        |          FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
        |           AND a.doc_id < b.doc_id),
        |ham AS (SELECT c.doc_a, c.doc_b,
        |          CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)
        |            AS BIGINT) AS hamming
        |        FROM cand c
        |        JOIN bits x ON c.doc_a = x.doc_id
        |        JOIN bits y ON c.doc_b = y.doc_id AND x.idx = y.idx
        |        GROUP BY 1, 2)
        |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 16""".stripMargin,
    // m5: the WAV synthesis + 64-point energy hash replayed exactly —
    // sampled idx = (w * n) // 64, raw = ((idx*131 + base*97) * 2654435761)
    // & 32767, +512-clamped on idx % 23 == variant, mean-threshold bits,
    // band values and hamming identical to m4's mechanics.
    "m5_audio_dedup" ->
      """WITH auds AS (
        |  SELECT doc_id, doc_id - doc_id % 8 + 1 AS base, (doc_id % 8) // 2 AS var
        |  FROM documents WHERE doc_id % 2 = 1),
        |dims AS (SELECT doc_id, base, var, base % 200 + 64 AS n FROM auds),
        |win AS (SELECT v AS w FROM (SELECT unnest(range(0, 64)) AS v)),
        |amps AS (
        |  SELECT doc_id, win.w AS idx,
        |    CASE WHEN ((win.w * n) // 64) % 23 = var
        |      THEN LEAST((((((win.w * n) // 64) * 131 + base * 97)
        |                   * 2654435761) & 32767) + 512, 32767)
        |      ELSE ((((win.w * n) // 64) * 131 + base * 97)
        |             * 2654435761) & 32767
        |    END AS g
        |  FROM dims CROSS JOIN win),
        |tot AS (SELECT doc_id, SUM(g) AS t FROM amps GROUP BY doc_id),
        |bits AS (SELECT a.doc_id, a.idx,
        |           CASE WHEN 64 * a.g > t.t THEN 1 ELSE 0 END AS bit
        |         FROM amps a JOIN tot t USING (doc_id)),
        |bands AS (SELECT doc_id, idx // 16 AS b,
        |            CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS bv
        |          FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
        |           AND a.doc_id < b.doc_id),
        |ham AS (SELECT c.doc_a, c.doc_b,
        |          CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)
        |            AS BIGINT) AS hamming
        |        FROM cand c
        |        JOIN bits x ON c.doc_a = x.doc_id
        |        JOIN bits y ON c.doc_b = y.doc_id AND x.idx = y.idx
        |        GROUP BY 1, 2)
        |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 16""".stripMargin,
    // The synthesis arithmetic replayed at the 64 nearest-neighbor sample
    // points: src = (g * dim) // 8, pixel = ((x*31 + y*17 + doc_id) *
    // 2654435761) & 0xFFFFFF, channels = bytes of the packed RGB.
    "m2_media_features" ->
      """WITH imgs AS (
        |  SELECT doc_id, doc_id % 97 + 8 AS w, doc_id * 3 % 71 + 8 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |grid AS (
        |  SELECT gx.v AS gx, gy.v AS gy
        |  FROM (SELECT unnest(range(0, 8)) AS v) gx,
        |       (SELECT unnest(range(0, 8)) AS v) gy),
        |px AS (
        |  SELECT doc_id,
        |    (((gx * w) // 8 * 31 + (gy * h) // 8 * 17 + doc_id)
        |      * 2654435761) & 16777215 AS v
        |  FROM imgs CROSS JOIN grid)
        |SELECT doc_id % 10 AS bucket,
        |  CAST(COUNT(*) // 64 AS BIGINT) AS n_imgs,
        |  CAST(SUM((v >> 16) & 255) AS BIGINT) AS sum_r,
        |  CAST(SUM((v >> 8) & 255) AS BIGINT) AS sum_g,
        |  CAST(SUM(v & 255) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1""".stripMargin,

    // m2's pixel-replay CTEs with the grid regrouped into 2×2 patch
    // blocks: patch_id = (gy // 2) * 4 + (gx // 2), row-major
    "m7_image_patches" ->
      """WITH imgs AS (
        |  SELECT doc_id, doc_id % 97 + 8 AS w, doc_id * 3 % 71 + 8 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |grid AS (
        |  SELECT gx.v AS gx, gy.v AS gy
        |  FROM (SELECT unnest(range(0, 8)) AS v) gx,
        |       (SELECT unnest(range(0, 8)) AS v) gy),
        |px AS (
        |  SELECT doc_id, (gy // 2) * 4 + (gx // 2) AS patch_id,
        |    (((gx * w) // 8 * 31 + (gy * h) // 8 * 17 + doc_id)
        |      * 2654435761) & 16777215 AS v
        |  FROM imgs CROSS JOIN grid)
        |SELECT CAST(patch_id AS BIGINT) AS patch_id,
        |  CAST(COUNT(*) // 4 AS BIGINT) AS n_imgs,
        |  CAST(SUM(((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255))
        |    AS BIGINT) AS sum_bright
        |FROM px GROUP BY 1""".stripMargin)
}
