package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media as opaque `binary` content + typed
  * metadata struct, with decode/feature-extraction run batch-wise over
  * partitions (the Scala equivalent of `mapInPandas` plumbing — iterator in,
  * iterator out, no per-row task overhead).
  *
  * The image codec is REAL — JDK `javax.imageio` (PNG/JPEG ship with the
  * JRE, no vendored natives): [[extractFeatures]] decodes actual bytes and
  * measures actual pixels, [[resize]] decodes, resamples, and re-encodes.
  * The audio codec is REAL too — JDK `javax.sound.sampled` WAV/PCM:
  * [[extractAudioFeatures]] decodes actual sample frames and measures
  * actual amplitudes. Video remains plan-only ([[frameSamplePlan]]) since
  * no video codec ships with the JDK.
  */
object Multimodal {

  /** Canonical media row: content + metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Wrap any table with a binary-able column into the media schema
    * (demonstration path: documents.text bytes stand in for opaque media).
    */
  def asMedia(df: DataFrame, idCol: String, binCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).cast("binary").as("content"),
      struct(
        lit(format).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Dimensions of the synthetic image for `id`: 3–8 px per side, so the
    * corpus covers a spread of shapes while staying SQL-restatable.
    */
  private[graft] def synthWidth(id: Long): Int = 3 + java.lang.Math.floorMod(id, 6L).toInt
  private[graft] def synthHeight(id: Long): Int =
    3 + java.lang.Math.floorMod(id / 6, 6L).toInt

  /** Channel value of flat pixel index `i` (i = (y*width + x)*3 + channel,
    * channels in R,G,B order): a fixed splitmix64 stream of (id, i), the
    * same public-constant stream every other deterministic kernel in this
    * engine uses — so an external SQL oracle can restate the expected
    * pixel statistics without decoding anything.
    */
  private[graft] def synthPixel(id: Long, i: Int): Int =
    java.lang.Math.floorMod(
      graft.functions.Hashing.splitmix64(id * 1000003L + i), 256L).toInt

  /** Deterministic synthetic image, REALLY encoded: pixels from
    * [[synthPixel]] drawn into a BufferedImage and written through the JDK
    * PNG encoder. PNG is lossless, so a correct decoder must read back the
    * exact generated pixels — which is what makes [[extractFeatures]]
    * oracle-checkable end-to-end.
    */
  private[graft] def synthPng(id: Long): (Int, Int, Array[Byte]) = {
    val w = synthWidth(id)
    val h = synthHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        img.setRGB(x, y,
          (synthPixel(id, base) << 16) | (synthPixel(id, base + 1) << 8) |
            synthPixel(id, base + 2))
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    (w, h, baos.toByteArray)
  }

  /** A real PNG corpus keyed by `idCol`, in [[mediaSchema]] — one encoder
    * per partition via mapPartitions, the shape that scales (no driver
    * involvement, no shuffle).
    */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    graft.operators.Par.fanOut(df.select(col(idCol).cast("long").as("media_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, png) = synthPng(id)
          Row(id, png, Row("image/png", w, h, null))
        }
      }(enc)
  }

  /** [[synthesizeImages]] with the pixel stream keyed by a SEPARATE seed
    * column: identical seeds yield byte-identical PNGs under distinct
    * media ids — the planted-duplicate corpus a perceptual-hash dedup
    * ([[imageAHash]]) is gated against.
    */
  def synthesizeImagesSeeded(df: DataFrame, idCol: String,
      seedCol: org.apache.spark.sql.Column): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    graft.operators.Par.fanOut(df.select(col(idCol).cast("long").as("media_id"),
        seedCol.cast("long").as("seed")))
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, png) = synthPng(r.getLong(1))
          Row(r.getLong(0), png, Row("image/png", w, h, null))
        }
      }(enc)
  }

  private val framePairSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content_a", BinaryType),
    StructField("content_b", BinaryType)))

  /** Both frames of a synthetic pair in ONE generator pass —
    * (media_id, content_a, content_b) with content_x = PNG(seedX). The
    * two-call form ([[synthesizeImagesSeeded]] twice + join on media_id)
    * shuffled every PNG blob through BOTH exchanges of a sort-merge join
    * just to re-pair rows that were born on the same input row — the
    * guide-§8 pathology (heavy opaque payloads moved for a decision that
    * needs only the key). Byte-identical frames, zero blob shuffles.
    */
  def synthesizeFramePairsSeeded(df: DataFrame, idCol: String,
      seedA: org.apache.spark.sql.Column,
      seedB: org.apache.spark.sql.Column): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(framePairSchema)
    graft.operators.Par.fanOut(df.select(col(idCol).cast("long").as("media_id"),
        seedA.cast("long").as("sa"), seedB.cast("long").as("sb")))
      .mapPartitions { rows =>
        rows.map { r =>
          val (_, _, pngA) = synthPng(r.getLong(1))
          val (_, _, pngB) = synthPng(r.getLong(2))
          Row(r.getLong(0), pngA, pngB)
        }
      }(enc)
  }

  val aHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("ahash", StringType),
    StructField("n_bits", IntegerType)))

  /** Average-hash perceptual fingerprint from a REAL decode: bit p (row-
    * major pixel index) is set iff the pixel's 3-channel sum strictly
    * exceeds the image mean — thresholded as the integer cross-multiply
    * `gray_p · n > total` so no division enters the value. Emitted as a
    * '0'/'1' string (3–8 px sides → 9–64 bits; a string dodges the
    * BIGINT sign bit at p = 63 and groups/joins just as well). Identical
    * pixels → identical hash, so planted duplicates collide exactly;
    * undecodable content hashes to the empty string.
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(aHashSchema)
    graft.operators.Par.fanOut(media.select("media_id", "content")).mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val img =
          if (content == null) null
          else
            try ImageIO.read(new ByteArrayInputStream(content))
            catch { case _: java.io.IOException => null }
        if (img == null) Row(r.getAs[Long]("media_id"), 0, 0, "", 0)
        else {
          val w = img.getWidth; val h = img.getHeight
          val n = w * h
          val gray = new Array[Long](n)
          var total = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val g = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              gray(y * w + x) = g
              total += g
              x += 1
            }
            y += 1
          }
          val sb = new java.lang.StringBuilder(n)
          var bits = 0
          var p = 0
          while (p < n) {
            val set = gray(p) * n > total
            sb.append(if (set) '1' else '0')
            if (set) bits += 1
            p += 1
          }
          Row(r.getAs[Long]("media_id"), w, h, sb.toString, bits)
        }
      }
    }(enc)
  }

  val frameDiffSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sad", LongType),
    StructField("n_vals", LongType)))

  /** Sum of absolute per-channel differences between two REALLY decoded
    * frames — the scene-change / static-shot primitive over consecutive
    * video frames. Input rows carry (media_id, content_a, content_b);
    * output is the exact integer SAD and the value count w·h·3, so every
    * downstream ratio is one division. Undecodable content or mismatched
    * dimensions → the zeros row (the mm4 zeros-on-undecodable contract),
    * never a poison-pill task failure. Same mapPartitions shape as
    * [[extractFeatures]]: decoder per partition, no shuffle, no driver.
    */
  def frameDiffStats(pairs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameDiffSchema)
    graft.operators.Par.fanOut(pairs.select("media_id", "content_a", "content_b"))
      .mapPartitions { rows =>
        def dec(b: Array[Byte]): BufferedImage =
          if (b == null) null
          else
            try ImageIO.read(new ByteArrayInputStream(b))
            catch { case _: java.io.IOException => null }
        // positional access (the select above pins the order): name-based
        // getAs needs a schema-carrying Row, which a generator-to-generator
        // chain (synthesizeFramePairsSeeded → here) does not produce
        rows.map { r =>
          val ia = dec(r.getAs[Array[Byte]](1))
          val ib = dec(r.getAs[Array[Byte]](2))
          if (ia == null || ib == null || ia.getWidth != ib.getWidth ||
              ia.getHeight != ib.getHeight)
            Row(r.getLong(0), 0, 0, 0L, 0L)
          else {
            val w = ia.getWidth; val h = ia.getHeight
            var sad = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val pa = ia.getRGB(x, y); val pb = ib.getRGB(x, y)
                sad += math.abs(((pa >> 16) & 0xFF) - ((pb >> 16) & 0xFF)) +
                  math.abs(((pa >> 8) & 0xFF) - ((pb >> 8) & 0xFF)) +
                  math.abs((pa & 0xFF) - (pb & 0xFF))
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), w, h, sad, w.toLong * h * 3)
          }
        }
      }(enc)
  }

  /** Real JDK decode: content bytes → (width, height, channels,
    * [mean, meanR, meanG, meanB] of the decoded pixels, each in [0, 1]).
    * Channel sums are accumulated as longs (exact, order-independent) with
    * one double division each at the end, so the values are bit-stable and
    * SQL-restatable. Undecodable or null content → (0, 0, 0, zeros) rather
    * than a poison-pill task failure — at 100 TB some fraction of a media
    * corpus is always corrupt.
    */
  private[graft] def decodeImage(content: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    val img =
      if (content == null) null
      else
        try ImageIO.read(new ByteArrayInputStream(content))
        catch { case _: java.io.IOException => null }
    if (img == null) return (0, 0, 0, Array.fill(4)(0.0))
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF
        sg += (rgb >> 8) & 0xFF
        sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (w, h, img.getColorModel.getNumComponents, Array(
      (sr + sg + sb).toDouble / (n * 3) / 255.0,
      sr.toDouble / n / 255.0,
      sg.toDouble / n / 255.0,
      sb.toDouble / n / 255.0))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** Batch feature extraction via mapPartitions: one decoder per
    * partition, rows streamed through it — the shape that scales to 100 TB
    * (decoder init cost amortized, no driver involvement, no shuffle).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    graft.operators.Par.fanOut(media.select("media_id", "content")).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c, f) = decodeImage(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[Long]("media_id"), w, h, c, f)
      }
    }(enc)
  }

  // -------------------------------------------------------------------
  // audio: real WAV/PCM codec (JDK javax.sound.sampled)
  // -------------------------------------------------------------------

  /** Audio shape for `id`: 8/16/24 kHz, mono or stereo, 40–69 frames —
    * a spread of formats, each parameter SQL-restatable from the id.
    */
  private[graft] def synthRate(id: Long): Int =
    8000 * (1 + java.lang.Math.floorMod(id, 3L).toInt)
  private[graft] def synthAudioChannels(id: Long): Int =
    1 + java.lang.Math.floorMod(id / 3, 2L).toInt
  private[graft] def synthFrames(id: Long): Int =
    40 + java.lang.Math.floorMod(id, 30L).toInt

  /** Signed 16-bit sample at flat index `i` (frame-major, channels
    * interleaved): the same public splitmix64 stream idiom as
    * [[synthPixel]], so an external SQL oracle can restate the expected
    * amplitude statistics without any audio codec.
    */
  private[graft] def synthSample(id: Long, i: Int): Int =
    java.lang.Math.floorMod(
      graft.functions.Hashing.splitmix64(id * 999983L + i), 65536L).toInt - 32768

  /** Deterministic synthetic audio, REALLY encoded: a canonical 44-byte
    * RIFF/WAVE header + little-endian 16-bit PCM. Lossless, so a correct
    * decoder must read back the exact generated samples.
    */
  private[graft] def synthWav(id: Long): (Int, Int, Int, Array[Byte]) = {
    val rate = synthRate(id)
    val ch = synthAudioChannels(id)
    val n = synthFrames(id)
    val dataLen = n * ch * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(ch.toShort).putInt(rate).putInt(rate * ch * 2)
      .putShort((ch * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n * ch) { bb.putShort(synthSample(id, i).toShort); i += 1 }
    (rate, ch, n, bb.array())
  }

  /** A real WAV corpus keyed by `idCol`, in [[mediaSchema]] (duration_ms
    * from the exact frame count). Same mapPartitions shape as
    * [[synthesizeImages]].
    */
  def synthesizeAudio(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    graft.operators.Par.fanOut(df.select(col(idCol).cast("long").as("media_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (rate, _, n, wav) = synthWav(id)
          Row(id, wav, Row("audio/wav", null, null, n.toLong * 1000L / rate))
        }
      }(enc)
  }

  /** Real JDK decode via `javax.sound.sampled.AudioSystem`: WAV bytes →
    * (sampleRate, channels, frames, [mean, rms, meanChannel0] amplitudes
    * in [-1, 1] / [0, 1]). Sums accumulate as longs (exact,
    * order-independent); each feature is the identical arithmetic the SQL
    * oracle states (one cast, one or two divisions, one sqrt), so the
    * doubles are bit-stable. Undecodable or null content → zeros, as with
    * [[decodeImage]].
    */
  private[graft] def decodeAudio(content: Array[Byte]): (Int, Int, Long, Array[Double]) = {
    val zero = (0, 0, 0L, Array.fill(3)(0.0))
    if (content == null) return zero
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (ais == null) return zero
    val fmt = ais.getFormat
    if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return zero
    val ch = fmt.getChannels
    val bytes =
      try ais.readAllBytes()
      catch { case _: java.io.IOException => return zero }
    // AudioSystem reports NOT_SPECIFIED (-1) frame counts for some
    // containers; emitting it raw would break the zeros-on-undecodable
    // contract (n_frames = -1 beside valid stats) — derive from the
    // decoded byte count instead (frameSize = channels * 2 for 16-bit)
    val rawFrames = ais.getFrameLength
    val frames =
      if (rawFrames == javax.sound.sampled.AudioSystem.NOT_SPECIFIED.toLong)
        bytes.length.toLong / (ch * 2)
      else rawFrames
    val n = bytes.length / 2
    var sum = 0L
    var sumSq = 0L
    var c0 = 0L
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      sum += s
      sumSq += s.toLong * s
      if (i % ch == 0) c0 += s
      i += 1
    }
    if (n == 0) return zero
    (fmt.getSampleRate.toInt, ch, frames, Array(
      sum.toDouble / n / 32768.0,
      math.sqrt(sumSq.toDouble / n) / 32768.0,
      c0.toDouble / (n / ch) / 32768.0))
  }

  /** Real JDK decode → time-domain DSP: WAV bytes → (sampleRate, channels,
    * frames, zeroCrossings, peakAbs, silentCount). Zero crossings are
    * counted on CHANNEL 0 (a sign flip between consecutive frames, "sign"
    * = s < 0); peak |s| and the |s| < 1024 silent-sample count run over
    * ALL interleaved samples. Every statistic is an exact integer, so the
    * SQL oracle restates them from the generation stream with no codec
    * and no float hazard. Undecodable or null content → zeros.
    */
  private[graft] def decodeAudioDsp(content: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    val zero = (0, 0, 0L, 0L, 0L, 0L)
    if (content == null) return zero
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (ais == null) return zero
    val fmt = ais.getFormat
    if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return zero
    val ch = fmt.getChannels
    val bytes =
      try ais.readAllBytes()
      catch { case _: java.io.IOException => return zero }
    // AudioSystem reports NOT_SPECIFIED (-1) frame counts for some
    // containers; emitting it raw would break the zeros-on-undecodable
    // contract (n_frames = -1 beside valid stats) — derive from the
    // decoded byte count instead (frameSize = channels * 2 for 16-bit)
    val rawFrames = ais.getFrameLength
    val frames =
      if (rawFrames == javax.sound.sampled.AudioSystem.NOT_SPECIFIED.toLong)
        bytes.length.toLong / (ch * 2)
      else rawFrames
    val n = bytes.length / 2
    if (n == 0) return zero
    var zc = 0L
    var peak = 0L
    var silent = 0L
    var prevNeg = false
    var first = true
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      if (a < 1024) silent += 1
      if (i % ch == 0) {
        val neg = s < 0
        if (!first && neg != prevNeg) zc += 1
        prevNeg = neg
        first = false
      }
      i += 1
    }
    (fmt.getSampleRate.toInt, ch, frames, zc, peak, silent)
  }

  val audioDspSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("zero_crossings", LongType),
    StructField("peak_abs", LongType),
    StructField("n_silent", LongType)))

  /** Batch audio DSP extraction — same scaling shape as
    * [[extractAudioFeatures]]: one decoder per partition, no shuffle.
    */
  def extractAudioDsp(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioDspSchema)
    graft.operators.Par.fanOut(media.select("media_id", "content")).mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, frames, zc, peak, silent) =
          decodeAudioDsp(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[Long]("media_id"), rate, ch, frames, zc, peak, silent)
      }
    }(enc)
  }

  val energyWindowSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("win", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_sq", LongType),
    StructField("peak_abs", LongType)))

  /** Channel-0 energy contour from a REAL decode: 16-frame windows, per
    * window the exact integer Σs² and peak |s| — the VAD / loudness
    * building block over consecutive audio windows (mm6 measures the
    * whole clip; this is the windowed view). Undecodable content emits
    * no rows (the zeros-on-undecodable contract degenerates to an empty
    * contour). One decoder per partition, rows flat-mapped, no shuffle.
    */
  def extractAudioEnergy(media: DataFrame, winFrames: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(energyWindowSchema)
    graft.operators.Par.fanOut(media.select("media_id", "content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val content = r.getAs[Array[Byte]]("content")
          val ais =
            if (content == null) null
            else
              try javax.sound.sampled.AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(content))
              catch {
                case _: javax.sound.sampled.UnsupportedAudioFileException => null
                case _: java.io.IOException => null
              }
          if (ais == null || ais.getFormat.getSampleSizeInBits != 16 ||
              ais.getFormat.isBigEndian ||
              ais.getFormat.getChannels <= 0) Iterator.empty
          else {
            val ch = ais.getFormat.getChannels
            val bytes =
              try ais.readAllBytes()
              catch { case _: java.io.IOException => Array.empty[Byte] }
            // floor division drops any trailing partial frame a truncated
            // payload leaves, so the channel-0 read below stays in-bounds:
            // max index 2·(frames−1)·ch+1 ≤ bytes.length−2·ch+1 < length
            val frames = bytes.length / (ch * 2)
            val id = r.getAs[Long]("media_id")
            (0 until (frames + winFrames - 1) / winFrames).iterator.map { w =>
              val lo = w * winFrames
              val hi = math.min(lo + winFrames, frames)
              var ss = 0L
              var peak = 0L
              var f = lo
              while (f < hi) {
                // channel 0 of frame f = little-endian sample at byte 2·f·ch
                val i = f * ch
                val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff))
                  .toShort.toLong
                ss += s * s
                val a = math.abs(s)
                if (a > peak) peak = a
                f += 1
              }
              Row(id, w, (hi - lo).toLong, ss, peak)
            }
          }
        }
      }(enc)
  }

  val tileSumSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("t0", LongType),
    StructField("t1", LongType),
    StructField("t2", LongType),
    StructField("t3", LongType),
    StructField("brightest", IntegerType)))

  /** Real JDK decode → 2×2 tile-grid intensity sums: per image the exact
    * BIGINT sum of all RGB channel values in each quadrant (pixel (x, y)
    * belongs to quadrant (2y ≥ h ? 2 : 0) + (2x ≥ w ? 1 : 0) — the same
    * integer rule a SQL oracle can restate), plus the argmax quadrant
    * (ties → lowest index). Tile pooling is the plumbing a patch-based
    * vision pipeline needs (ViT patch stats, saliency crops); the exact
    * integer sums make a stubbed or lossy decoder fail the oracle.
    * Undecodable or null content → zeros. Same scaling shape as
    * [[imageAHash]]: one decoder per partition via mapPartitions,
    * no shuffle.
    */
  def extractTileSums(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(tileSumSchema)
    graft.operators.Par.fanOut(media.select("media_id", "content")).mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val img =
          if (content == null) null
          else
            try ImageIO.read(new ByteArrayInputStream(content))
            catch { case _: java.io.IOException => null }
        if (img == null) Row(r.getAs[Long]("media_id"), 0, 0, 0L, 0L, 0L, 0L, 0)
        else {
          val w = img.getWidth; val h = img.getHeight
          val t = new Array[Long](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val g = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              t((if (2 * y >= h) 2 else 0) + (if (2 * x >= w) 1 else 0)) += g
              x += 1
            }
            y += 1
          }
          var best = 0
          var k = 1
          while (k < 4) { if (t(k) > t(best)) best = k; k += 1 }
          Row(r.getAs[Long]("media_id"), w, h, t(0), t(1), t(2), t(3), best)
        }
      }
    }(enc)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** Batch audio feature extraction — same scaling shape as
    * [[extractFeatures]]: one decoder per partition, no shuffle.
    */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioFeatureSchema)
    graft.operators.Par.fanOut(media.select("media_id", "content")).mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, frames, f) = decodeAudio(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[Long]("media_id"), rate, ch, frames, f)
      }
    }(enc)
  }

  /** Deterministic frame sampling plan for video-like media: every
    * `everyMs` within duration — pure plan, explode-based, no codec.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0L),
        coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs))).as("frame_ts_ms"))

  /** Real resize: JDK decode → nearest-neighbour resample → JDK PNG
    * re-encode. Nearest-neighbour with floor source sampling is used
    * instead of Graphics2D scaling because it is bit-deterministic across
    * JVMs and platforms (no rendering-pipeline variance). Undecodable
    * content resizes to null.
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"target size must be positive: $width x $height")
    val resizeUdf = udf((content: Array[Byte]) => {
      val img =
        if (content == null) null
        else
          try ImageIO.read(new ByteArrayInputStream(content))
          catch { case _: java.io.IOException => null }
      if (img == null) null
      else {
        val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          val sy = (y.toLong * img.getHeight / height).toInt
          var x = 0
          while (x < width) {
            val sx = (x.toLong * img.getWidth / width).toInt
            out.setRGB(x, y, img.getRGB(sx, sy))
            x += 1
          }
          y += 1
        }
        val baos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", baos)
        baos.toByteArray
      }
    })
    media.select(col("media_id"), resizeUdf(col("content")).as("content"),
      struct(col("meta.format"), lit(width).as("width"), lit(height).as("height"),
        col("meta.duration_ms")).as("meta"))
  }
}
