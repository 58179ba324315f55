package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution-normalizing maps driven by global order statistics —
 * the reference's CumulativeDistributionFunction / HistogramEqualization
 * family (StatsTools; SURVEY.md §2.4 "two-pass: agg -> broadcast stats
 * -> withColumn").
 *
 * A naive `cume_dist().over(Window.orderBy(v))` moves ALL rows to one
 * partition (Spark warns exactly that) — a driver-sized sort on one
 * task at scale. [[cumeDist]] instead computes the same result in two
 * distributed passes: (1) per-range counts on a coarse value bin,
 * rolled into broadcast prefix sums; (2) a window partitioned BY BIN
 * ranks rows within their bin only. Every shuffle is keyed by bin, so
 * partitions stay bounded by bin width, not data size.
 */
object Distribution {

  /**
   * Exact equivalent of
   * `round(cume_dist() OVER (ORDER BY value, tie), 6)` under a total
   * order (the tie column must make the ordering unique): with no
   * peers, cume_dist(row) = global_position / N, and global position
   * = (rows in lower bins) + (rank within own bin).
   *
   * `binWidth` only affects parallelism (bin count must be modest —
   * the per-bin count table is collected and broadcast), never the
   * result.
   */
  def cumeDist(df: DataFrame, value: Column, tie: Column,
               binWidth: Double, outName: String = "cd",
               posName: Option[String] = None): DataFrame = {
    val binned = df.withColumn("__bin",
      floor(value / binWidth).cast("long"))
    val counts = binned.groupBy("__bin")
      .agg(count(lit(1)).as("__k"))
      .orderBy("__bin")
      .collect()
    val n = counts.map(_.getLong(1)).sum.toDouble
    var running = 0L
    val offsets = counts.map { r =>
      val o = (r.getLong(0), running)
      running += r.getLong(1)
      o
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__bin", "__off")
    val w = Window.partitionBy("__bin").orderBy(value.asc, tie.asc)
    // posName: the EXACT global position (1-based) — consumers that
    // need a rank must join on this, not un-round the CDF (a 6-decimal
    // CDF recovers ranks only up to n*5e-7, wrong beyond ~1e6 rows)
    val withPos = binned.join(broadcast(offDf), Seq("__bin"))
      .withColumn("__pos",
        (col("__off") + row_number().over(w)).cast("long"))
      .withColumn(outName, round(col("__pos") / lit(n), 6))
    posName.fold(withPos.drop("__pos"))(p =>
        withPos.withColumnRenamed("__pos", p))
      .drop("__bin", "__off")
  }
}
