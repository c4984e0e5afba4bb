package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The Spark side is real and tested — schema, partitioning, batch
  * iteration via `mapPartitions` on a typed Dataset (the Scala
  * equivalent of `mapInPandas` batch processing: one decoder
  * instantiation per partition, rows streamed through it). The codec
  * itself is STUBBED (`FakeCodec`) — this container has no image/audio
  * libraries — with a deterministic byte-hash "decode" so tests assert
  * exact outputs; swap `FakeCodec` for a real JNI/library codec
  * without touching any of the distributed plumbing.
  *
  * At 100 TB: binary payloads dominate row size, so ops that don't
  * need bytes must prune the column (schema keeps media metadata in
  * separate scalar columns precisely so planners can skip the blob),
  * and `maxPartitionBytes` should be sized to a few hundred media rows
  * per task.
  */
object Multimodal {

  /** Typed media row — binary payload + scalar metadata columns that
    * survive column pruning independently of the blob. */
  final case class MediaRow(
      media_id: Long,
      kind: String,           // image | audio | video
      format: String,         // png | jpg | wav | mp4 | ...
      width: Int,
      height: Int,
      duration_ms: Long,
      content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** STUB codec — deterministic stand-in for image/audio decode.
    * Replace with a real library binding; the call shape (bytes in,
    * fixed-width float feature out) is what a CLIP-style embedder or
    * mel-spectrogram extractor produces. */
  object FakeCodec {
    def features(content: Array[Byte], dims: Int): Array[Float] = {
      import graft.functions.SketchHash.mix64
      var h = 0x6a09e667f3bcc908L
      var i = 0
      while (i < content.length) { h = mix64(h ^ content(i)); i += 1 }
      Array.tabulate(dims) { d =>
        // map each seeded hash to [-1, 1) — fake but deterministic
        (mix64(h + d).toDouble / Long.MaxValue.toDouble).toFloat
      }
    }

    /** "Frame sampling" stub: n evenly spaced byte slices standing in
      * for decoded video frames. */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (content.isEmpty) Seq.empty
      else {
        val step = math.max(1, content.length / n)
        (0 until math.min(n, content.length)).map { i =>
          content.slice(i * step, math.min(i * step + step, content.length))
        }
      }
    }
  }

  /** Batch feature extraction: one codec per partition, rows streamed
    * through — the mapInPandas-shaped path. The output drops the blob
    * (features only), so downstream plans never carry bytes. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (model load, JNI handle)
      rows.map { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
          FakeCodec.features(bytes, dims))
      }
    }
  }

  /** Resize for image rows — the metadata contract is REAL (width
    * scales to `targetWidth`, height keeps aspect), the pixel work is
    * the stub (deterministic byte subsampling at the scale ratio,
    * standing in for a real scaler). Non-image rows and already-small
    * images pass through untouched, and the output is again
    * `MediaRow`, so resize composes with [[extractFeatures]] /
    * [[sampleFrames]] in one pipeline. Same mapPartitions batch shape
    * (per-partition scaler init). */
  def resize(media: Dataset[MediaRow], targetWidth: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes0 = if (r.content == null) Array.empty[Byte] else r.content
        if (r.kind != "image" || r.width <= targetWidth || bytes0.isEmpty) r
        else {
          val ratio = r.width.toDouble / targetWidth
          val bytes = bytes0
          val outLen = math.max(1, (bytes.length / ratio).toInt)
          val content = Array.tabulate(outLen)(
            i => bytes(math.min(bytes.length - 1, (i * ratio).toInt)))
          r.copy(width = targetWidth,
            height = math.max(1, (r.height / ratio).toInt),
            content = content)
        }
      }
    }
  }

  /** Frame sampling for video rows: explodes each video into ≤ n frame
    * rows (media_id, frame_idx, frame_bytes). */
  def sampleFrames(media: Dataset[MediaRow], n: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        FakeCodec.sampleFrames(bytes, n).zipWithIndex.map {
          case (frame, idx) => (r.media_id, idx, frame)
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Metadata-only projection — demonstrates that scalar metadata is
    * readable with the binary column pruned away (check the plan's
    * ReadSchema: no `content`). */
  def metadataSummary(df: DataFrame): DataFrame =
    df.groupBy(col("kind"), col("format"))
      .agg(count(lit(1)).as("n"),
        avg(col("width")).as("avg_width"),
        avg(col("duration_ms")).as("avg_duration_ms"))
      .orderBy(col("kind"), col("format"))

  /** Deterministic synthetic media table for tests/demos (no media
    * libs in this container — payloads are seeded byte patterns). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      import graft.functions.SketchHash.mix64
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val fmt = Map("image" -> "png", "audio" -> "wav", "video" -> "mp4")(kind)
      val len = 64 + (mix64(i) & 0xFF).toInt
      val content = Array.tabulate(len)(b => (mix64(i * 1000L + b) & 0xFF).toByte)
      MediaRow(i, kind, fmt, 64 + (i % 8).toInt * 16, 64, if (kind == "video") 4000L else 0L, content)
    }
  }
}
