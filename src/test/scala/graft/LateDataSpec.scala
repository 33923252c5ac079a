package graft

import java.nio.file.Files
import graft.streaming.{StreamingQueries, StreamReplay}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark late-data semantics (SURVEY §2.1-I): an event arriving after
  * the watermark has passed its window is DROPPED in append mode. Crafted
  * replay: file 1 carries late morning data, file 2 jumps far ahead
  * (advancing the watermark), file 3 delivers an event for the long-closed
  * first window — it must not appear in the emitted counts. */
class LateDataSpec extends SparkSuite {

  test("event behind the watermark is dropped from its (already emitted) window") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_late_").toString
    def write(part: Int, rows: Seq[(Long, String)]): Unit =
      rows.toDF("event_id", "s")
        .select(
          col("event_id"),
          unix_micros(col("s").cast("timestamp")).cast("long") * 1000L as "ts", // → ns
          lit(7L).as("user_id"), lit("late_test").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("append").parquet(dir)

    // File source orders batches by modification time — space the writes so
    // each file is its own microbatch. The watermark must EVICT the 10:00
    // window in a batch BEFORE the late row arrives: within a single batch
    // Spark applies state updates before eviction, so a late row that lands
    // in the same batch as the watermark jump is still (legally) admitted —
    // the drop guarantee only covers state already evicted in a prior batch.
    write(1, Seq((1L, "2024-06-01 10:05:00"), (2L, "2024-06-01 10:10:00")))
    Thread.sleep(1100)
    // file 2: far future — watermark advances hours past the 10:00 window
    write(2, Seq((3L, "2024-06-01 20:00:00")))
    Thread.sleep(1100)
    // file 3: another future batch — the 10:00 window is now evicted+emitted
    write(3, Seq((5L, "2024-06-01 20:05:00")))
    Thread.sleep(1100)
    // file 4: a LATE event for the 10:00 window (behind the watermark,
    // state already evicted) — must be dropped
    write(4, Seq((4L, "2024-06-01 10:20:00")))

    val q = StreamingQueries.tumblingStream(spark, dir, maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("late_tumb")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val counts = spark.table("late_tumb")
      .select(col("w").cast("string"), col("cnt")).as[(String, Long)].collect().toMap
    // the 10:00 window closed with 2 events; the late 4th never lands anywhere
    assert(counts("2024-06-01 10:00:00") == 2L,
      s"late event was wrongly admitted: $counts")
  }
}
