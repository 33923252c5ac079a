package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Replay harness: turns the static `events` parquet into a file-based
  * stream (time-ordered multi-file rewrite → `readStream` with
  * maxFilesPerTrigger=1) so watermark/late-data semantics can be exercised
  * without a live source. Used by the batch↔stream parity tests (§5.4).
  *
  * The rewrite keeps the raw ns longs (nanosAsLong) so the streaming side
  * applies the identical ns→µs truncation as the batch loader — parity is
  * then a pure semantics check, not a data-prep artifact.
  */
object StreamReplay {

  /** Source events with `ts` as raw ns-since-epoch longs, whatever the
    * generator's physical encoding (INT64 NANOS read via nanosAsLong, or
    * native TIMESTAMP(MICROS) converted with unix_micros·1000 — exact, µs
    * precision has no sub-µs bits to lose). The replay dir is then always
    * ns longs, so the streaming side's ns→µs truncation stays the single
    * conversion under test. */
  private def rawNsEvents(s: SparkSession, sfDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  }

  /** Rewrite `$sfDir/events.parquet` as `n` time-ordered parquet files in a
    * fresh temp dir; returns the dir. Time-ordering files means event time
    * advances with processing time, so watermarks close windows in order. */
  def rewriteOrdered(s: SparkSession, sfDir: String, n: Int): String = {
    val dir = Files.createTempDirectory("graft_stream_").toString
    rawNsEvents(s, sfDir)
      .repartitionByRange(n, col("ts"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Like `rewriteOrdered`, but each event's FILE placement is jittered by
    * a deterministic ±`jitterMinutes` offset (md5 of event_id), so events
    * arrive out of order ACROSS microbatches while staying legal under a
    * 2×jitter watermark: an event can trail others at most 2×jitter newer,
    * so at its arrival `max_seen - watermark ≤ its ts` (use a watermark
    * comfortably above 2×jitter so boundary equality never drops rows).
    * Exercises the
    * stateful operators' out-of-order paths (backward session extension,
    * separate earlier intervals) that a time-ordered replay never hits. */
  def rewriteJittered(s: SparkSession, sfDir: String, n: Int,
                      jitterMinutes: Int = 4): String = {
    val dir = Files.createTempDirectory("graft_stream_").toString
    val jitterNs = jitterMinutes * 60L * 1000000000L
    rawNsEvents(s, sfDir)
      .withColumn("__k", col("ts") +
        (expr(s"pmod(cast(conv(substr(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint), ${2 * jitterNs})") - lit(jitterNs)))
      .repartitionByRange(n, col("__k"))
      .drop("__k")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Run a streaming DataFrame to completion over a finite replay dir,
    * collecting everything emitted in append mode into a memory sink.
    * Returns the collected result as a DataFrame. */
  def runToCompletion(s: SparkSession, streamed: DataFrame, name: String,
                      mode: String = "append"): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }
}
