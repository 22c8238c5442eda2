package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media as opaque `binary` content + typed
  * metadata struct, with decode/feature-extraction run batch-wise over
  * partitions (the Scala equivalent of `mapInPandas` plumbing — iterator in,
  * iterator out, no per-row task overhead).
  *
  * The actual codecs (JPEG decode, audio resample, video frame-sample) are
  * STUBBED with a deterministic fake (this container ships no media
  * libraries); everything around them — schema, batching, partitioning,
  * output shape — is real and tested, so swapping in a real codec is a
  * one-function change.
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
    * (demonstration path: documents.text bytes stand in for image bytes).
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

  /** STUB decoder: a real implementation would decode `content` with an
    * image codec. The fake derives a deterministic 8-dim feature vector
    * and pseudo width/height from the bytes, preserving the exact
    * signature a real decoder would have.
    */
  private[llm] def decodeStub(content: Array[Byte]): (Int, Int, Array[Double]) = {
    if (content == null) (0, 0, Array.fill(8)(0.0))
    else {
      val h = java.util.Arrays.hashCode(content)
      val w = math.abs(h % 1024) + 1
      val ht = math.abs((h / 1024) % 1024) + 1
      // floorMod keeps features in [0, 1) and, like every hash in this
      // engine, stays bit-exactly replicable by the SQL oracle
      val feats = Array.tabulate(8) { i =>
        java.lang.Math.floorMod(
          graft.functions.Hashing.splitmix64(h.toLong * 31 + i), 1000L).toDouble / 1000.0
      }
      (w, ht, feats)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** Batch feature extraction via mapPartitions: one decoder instance per
    * partition, rows streamed through it — the shape that scales to 100 TB
    * (decoder init cost amortized, no driver involvement, no shuffle).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    graft.operators.Par.fanOut(media.select("media_id", "content")).mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (w, h, f) = decodeStub(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[Long]("media_id"), w, h, f)
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

  /** STUB resize: a real implementation decodes, scales to width×height,
    * re-encodes. The fake keeps the signature and metadata contract —
    * content replaced by a deterministic digest-sized payload, meta.width/
    * height set to the target — so pipeline code (batch shape, schema)
    * is fully exercisable without codecs.
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val resizeUdf = udf((content: Array[Byte]) =>
      if (content == null) null
      else {
        // stand-in for the scaled image: deterministic bytes derived from
        // the source content and target size
        val seed = java.util.Arrays.hashCode(content).toLong * 31 +
          graft.functions.Hashing.splitmix64(width.toLong << 32 | height.toLong)
        val out = new Array[Byte](64)
        var i = 0
        while (i < out.length) {
          out(i) = (graft.functions.Hashing.splitmix64(seed + i) & 0xFF).toByte
          i += 1
        }
        out
      })
    media.select(col("media_id"), resizeUdf(col("content")).as("content"),
      struct(col("meta.format"), lit(width).as("width"), lit(height).as("height"),
        col("meta.duration_ms")).as("meta"))
  }
}
