package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal.asofJoin: inclusive as-of pick, right-ts tie-break by
  * greatest tie id, nulls before any right row, key isolation. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin picks latest right at-or-before, ties by greatest id") {
    val left = Seq(
      (1L, 10L, 5L),   // before any right -> nulls
      (2L, 10L, 10L),  // equal ts matches (inclusive); tie -> id 102
      (3L, 10L, 25L),  // after both rights at ts 10 and 20 -> ts 20
      (4L, 99L, 50L)   // other key, no rights -> nulls
    ).toDF("event_id", "k", "us")
    val right = Seq(
      (101L, 10L, 10L),
      (102L, 10L, 10L), // same ts as 101: greater id wins
      (103L, 10L, 20L)
    ).toDF("rid", "k", "rus")
    val got = Temporal.asofJoin(left, right, Seq("k"), "us", "rus",
        "rid", Seq("rid", "rus"))
      .select("event_id", "asof_rid", "asof_rus")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got === Set(
      (1L, None, None),
      (2L, Some(102L), Some(10L)),
      (3L, Some(103L), Some(20L)),
      (4L, None, None)))
  }

  test("asofJoin matches a brute-force per-row scan on random data") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map(i =>
      (i.toLong, (rnd.nextInt(5)).toLong, rnd.nextInt(100).toLong))
    val right = (0 until 150).map(i =>
      (1000L + i, (rnd.nextInt(5)).toLong, rnd.nextInt(100).toLong))
    val want = left.map { case (id, k, ts) =>
      val cands = right.filter(r => r._2 == k && r._3 <= ts)
      val pick =
        if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._3, r._1)))
      (id, pick.map(_._1), pick.map(_._3))
    }.toSet
    val got = Temporal.asofJoin(
        left.toDF("event_id", "k", "us"),
        right.toDF("rid", "k", "rus"),
        Seq("k"), "us", "rus", "rid", Seq("rid", "rus"))
      .select("event_id", "asof_rid", "asof_rus")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got === want)
  }
}
