package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface. The reference has no streaming at all
 * (SURVEY.md §2.11) — every tool is a batch file transform — so this
 * module is engine-added capability: the same tumbling-window
 * aggregation the batch `events_window` query computes, expressed as
 * an incremental streaming query with event-time + watermark, plus a
 * streaming cell-assignment for geo-tagged event feeds.
 *
 * At cluster scale the source would be a Kafka/file-drop feed of
 * crawled pages; locally the parquet `events` table drives it
 * (file-source directory + glob).
 */
object EventStreams {

  /** Streaming tumbling-window count/sum by event_type with a
    * 10-minute watermark. `dir` is the testdata sf directory. */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read
      .parquet(s"$dir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts2", col("ts").cast("timestamp"))
      .withWatermark("ts2", "10 minutes")
      .groupBy(window(col("ts2"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("window.start").cast("long").as("bucket"),
        col("event_type"), col("n"), col("sum_value_cents"))
  }

  /** Batch equivalent for differential testing. */
  def windowedCountsBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts2", col("ts").cast("timestamp"))
      .groupBy(window(col("ts2"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("window.start").cast("long").as("bucket"),
        col("event_type"), col("n"), col("sum_value_cents"))
}
