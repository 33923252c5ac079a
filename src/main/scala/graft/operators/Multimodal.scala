package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * This container has no media codecs, so the decode kernel is STUBBED
  * (`StubDecoder` — deterministic features derived from the bytes). The
  * Spark-side plumbing is real and is the part that matters at scale:
  *  - the schema contract (binary payload + metadata struct),
  *  - `mapPartitions` batch shape (one decoder instance per partition, the
  *    same shape a Pandas-UDF/`mapInPandas` kernel has in PySpark: the
  *    expensive per-process init is amortized across the partition),
  *  - partition sizing: decode is CPU-heavy per row, so repartition to
  *    many small partitions BEFORE the decode stage — the parquet scan's
  *    partitioning (size-based) is wrong for a compute-bound stage.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  case class MediaRow(id: Long, kind: String, payload: Array[Byte])

  /** Decoded (stub) features. A real decoder would fill width/height/frames
    * from the codec; the stub derives them deterministically from bytes. */
  case class MediaFeatures(id: Long, kind: String, byteLen: Long, sha: String,
                           width: Int, height: Int, frames: Int)

  /** Decode kernel contract: one instance per partition, called per batch. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic stand-in for the codec-backed decoder. */
  object StubDecoder extends Decoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(r.id, r.kind, n.toLong, sha, n % 640, n % 480, n % 16 + 1)
    }
  }

  /** The batch decode stage: partition-parallel, decoder instantiated once
    * per partition. `decodeParallelism` controls the repartition ahead of
    * the compute-bound stage. */
  def decodeFeatures(rows: Dataset[MediaRow], decoder: Decoder,
                     decodeParallelism: Int): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.repartition(decodeParallelism)
      .mapPartitions(it => it.map(decoder.decode))
  }

  /** Frame sampling stage: every `step`-th frame index per media row, each
    * with a deterministic per-frame fingerprint (decode-stub analogue of
    * hashing the decoded frame). Runs AFTER decode as a pure projection +
    * generator — the explode multiplies rows before any shuffle, so the
    * downstream per-frame pipeline parallelizes over frames, not videos
    * (one 2-hour video ≠ one task). */
  def sampleFrames(features: Dataset[MediaFeatures], step: Int): DataFrame =
    features.toDF()
      .select(col("id"), col("sha"),
        explode(expr(s"sequence(0, frames - 1, $step)")).as("frame_idx"))
      .withColumn("frame_sha", sha2(concat_ws(":", col("sha"), col("frame_idx")), 256))

  /** Demo wiring over the documents table (text bytes as the payload). */
  def documentsAsMedia(s: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, sfDir)
      .select(col("doc_id").as("id"), lit("text").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
