package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media travel as opaque BINARY columns with typed metadata;
  * decode / feature-extraction / frame-sampling run as partition-batched
  * kernels behind a pluggable decoder trait.
  *
  * The actual image/audio codecs are NOT in this container, so
  * [[HashFeatureDecoder]] provides a deterministic fake (documented, test
  *-covered) while the Spark-side plumbing — schema, batch shape,
  * partition-level batching, feature vector layout — is real. A production
  * decoder (JavaCV / TwelveMonkeys / ffmpeg-over-pipe) drops in behind
  * [[MediaDecoder]] without touching any pipeline code.
  */
object Multimodal {

  /** Canonical media schema: content is opaque; metadata is typed. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Decode boundary. Implementations MUST be deterministic per byte
    * content (results are joined back by media_id downstream). */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    /** bytes -> feature vector; None for undecodable content. */
    def features(modality: String, content: Array[Byte]): Option[Array[Float]]
  }

  /** Deterministic stand-in decoder: features are a folded byte histogram —
    * stable across runs/JVMs, zero native deps. Clearly NOT a real codec;
    * swap for a production decoder behind the same trait.
    *
    * The fold accumulates exact integer byte sums and divides once at the
    * end, so feature j is the closed form float((Σ bytes[i≡j mod dim] /
    * 255) / max(len/dim, 1)) — order-independent and replayable by the
    * DuckDB oracle (a float running sum would be accumulation-order
    * sensitive and only approximately reproducible). */
  final class HashFeatureDecoder(val featureDim: Int = 16) extends MediaDecoder {
    override def features(modality: String, content: Array[Byte]): Option[Array[Float]] = {
      if (content == null || content.isEmpty) None
      else {
        val acc = new Array[Long](featureDim)
        var i = 0
        while (i < content.length) {
          acc(i % featureDim) += (content(i) & 0xff)
          i += 1
        }
        val n = math.max(content.length / featureDim, 1)
        Some(acc.map(a => (a.toDouble / 255.0 / n).toFloat))
      }
    }
  }

  /** Partition-batched feature extraction — the mapInPandas analogue:
    * each task decodes its partition's rows in one pass (the decoder can
    * amortize model/codec init per partition, never per row). Output:
    * (media_id, modality, features ARRAY<FLOAT>, n_bytes). */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id").cast("long"), col("modality"),
        col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (codec handles, model weights…)
        it.map { case (id, mod, bytes) =>
          val f = decoder.features(mod, bytes)
          (id, mod, f.orNull, if (bytes == null) 0L else bytes.length.toLong)
        }
      }
    out.toDF("media_id", "modality", "features", "n_bytes")
  }

  /** Frame sampling for video-ish payloads: split the binary into
    * fixed-size chunks and keep every `stride`-th — the relational shape of
    * frame extraction (one row in, many frame rows out, ordinal preserved). */
  def sampleFrames(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, ord) => (id, ord, chunk) }
      }
      .toDF("media_id", "frame_ordinal", "frame_bytes")
  }

  /** Exact dedup of binary media by raw content hash, per modality —
    * the first pass of any multimodal corpus build (identical images
    * re-crawled under different URLs collapse here before any decode
    * cost is paid). Same keep-min-id/groupBy shape as the text tier's
    * `Dedup.exact`; perceptual near-dup (pHash etc.) plugs in behind
    * the [[MediaDecoder]] boundary as a feature-space pass. */
  def dedupBinary(media: DataFrame): DataFrame =
    media.withColumn("content_hash", md5(col("content")))
      .groupBy("modality", "content_hash")
      .agg(min(col("media_id")).as("kept_id"),
        count(lit(1)).as("dup_count"))

  /** Wrap arbitrary keyed binary data into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, contentCol: String,
              modality: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(contentCol).cast("binary").as("content"),
      lit(null).cast("string").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))
}
