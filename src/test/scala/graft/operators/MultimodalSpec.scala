package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real image-decode arm added in r5: JDK PNG codec round trip
  * (lossless, so decoded pixel sums equal the synthesis formula) and
  * undecodable-blob handling. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PNG round trip: decoded gray sum equals the pixel formula; garbage drops") {
    import spark.implicits._
    val ids = Seq(0L, 7L, 123L)
    val rows = ids.map(id => (id, Multimodal.syntheticPng(id, 16, 16))) :+
      (999L, Array[Byte](1, 2, 3, 4)) // not an image
    val out = Multimodal
      .decodeImageFeatures(rows.toDF("id", "img"))
      .collect().map(f => f.id -> f).toMap
    assert(!out.contains(999L), "garbage blob must be dropped")
    ids.foreach { id =>
      val expect = (for (x <- 0 until 16; y <- 0 until 16)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      val f = out(id)
      assert(f.width == 16 && f.height == 16)
      assert(f.gray_sum == expect, s"id $id")
    }
  }
}
