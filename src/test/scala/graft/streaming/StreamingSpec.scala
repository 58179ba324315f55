package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TestSpark

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch equivalent (complete mode)") {
    val q = EventStreams.windowedCounts(spark, dir)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT bucket, event_type, n, sum_value_cents FROM stream_out")
        .collect().map(_.toSeq).toSet
      val want = EventStreams.windowedCountsBatch(spark, dir)
        .collect().map(_.toSeq).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stateful streaming sessionization equals the batch twin " +
    "(closed sessions in-batch, trailing sessions by event-time timeout)") {
    import org.apache.spark.sql.functions._
    val q = EventStreams.sessionizeStream(spark, dir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sess_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, n_events, start_us, end_us FROM sess_out")
        .collect().map(_.toSeq).toSet

      // batch twin: the window-function sessionization (the oracle
      // shape of the events_sessionize query)
      val e = spark.read.parquet(s"$dir/events.parquet")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val batch = e
        .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .withColumn("new_sess",
          when(col("gap").isNull || col("gap") > EventStreams.SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      val maxUs = e.agg(max(expr("unix_micros(CAST(ts AS TIMESTAMP))")))
        .head().getLong(0)
      // with a 0s watermark delay the final watermark is max(ts); a
      // session closes via timeout once end + gap passes it — only
      // each user's trailing session near the stream end can stay open
      val wmMs = maxUs / 1000L
      val all = batch.select("user_id", "n_events", "start_us", "end_us")
        .collect().map(_.toSeq).toSet
      val mustEmit = batch
        .where(col("end_us") / 1000L + EventStreams.SessionGapUs / 1000L
          < wmMs - 1000L)
        .select("user_id", "n_events", "start_us", "end_us")
        .collect().map(_.toSeq).toSet
      assert(got.subsetOf(all),
        "streaming emitted a session the batch twin does not have")
      assert(mustEmit.subsetOf(got),
        "a provably-closed session was not emitted")
      assert(got.nonEmpty && mustEmit.nonEmpty)
    } finally q.stop()
  }
}
