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
}
