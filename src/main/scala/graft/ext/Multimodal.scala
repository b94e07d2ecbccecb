package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `BINARY`
  * payloads with typed metadata, plus batch decode/feature plumbing
  * (SURVEY §7.5 extension surface).
  *
  * Design for 100 TB:
  *  - payloads ride as parquet binary columns (or out-of-line object
  *    paths in `uri`) — never strings;
  *  - decode/resize/frame-sample run per-partition with an
  *    iterator-to-iterator `mapPartitions` (the Scala analogue of
  *    `mapInPandas` batches): decoder state is initialized once per
  *    partition, rows stream through without materializing the
  *    partition, and Spark's whole task pipeline stays lazy;
  *  - the actual codec call is STUBBED (no image/audio libraries in
  *    this container — marked clearly below); the schema, batching,
  *    partitioning and UDF signature are real and tested.
  */
object Multimodal {

  /** Typed metadata extracted per media payload. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      content_md5: String,
      width: Int,
      height: Int,
      format: String
  )

  /** A decoded/fake-decoded feature row. */
  final case class MediaFeature(
      doc_id: Long,
      frame: Int,
      feature: Array[Float]
  )

  /** STUB decoder — stands in for an image/audio codec (none available
    * in-container). Deterministic: derives fake dimensions from the
    * payload digest so tests are stable. Replace the body with a real
    * codec (e.g. javax.imageio / ffmpeg JNI) in production; the
    * per-partition initialization + iterator contract stays unchanged.
    */
  private[ext] def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(bytes)
    val hex = digest.map(b => f"$b%02x").mkString
    MediaMeta(
      doc_id = id,
      n_bytes = bytes.length.toLong,
      content_md5 = hex,
      width = 1 + (java.lang.Long.parseLong(hex.take(7), 16) % 997).toInt,
      height = 1 + (bytes.length % 743),
      format = "stub/raw")
  }

  /** Payload column from a text table (testdata has no binary column;
    * production reads `binaryFile` sources or parquet binary directly).
    */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Batch metadata extraction: one decoder instance per partition,
    * iterator-to-iterator (never materializes a partition).
    */
  def extractMeta(spark: SparkSession, docs: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init goes here (stub has none)
        rows.map { case (id, bytes) => stubDecode(id, bytes) }
      }
  }

  /** Batch feature extraction ("frame sampling"): emits `frames` fixed
    * deterministic feature vectors per payload — the fan-out shape of a
    * video/audio frame sampler (1 row in, N rows out, iterator-lazy).
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame, idCol: String,
      frames: Int, dim: Int): Dataset[MediaFeature] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          // STUB: real impl decodes + samples frames; this derives a
          // deterministic pseudo-feature from (id, frame, byte stats)
          val s = if (bytes.isEmpty) 0f else bytes.map(_.toInt & 0xff).sum.toFloat / bytes.length
          (0 until frames).iterator.map { f =>
            MediaFeature(id, f,
              Array.tabulate(dim)(i => (s + f * 31 + i) % 97 / 97.0f))
          }
        }
      }
  }
}
