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
  /**
   * Standard-normal CDF Φ(z) as generated SQL text — the same string
   * is parsed by BOTH Spark (expr) and DuckDB, so the arithmetic tree
   * is identical by construction (TestForNormality's K-S statistic
   * needs Φ, and libm erf is not cross-engine reproducible).
   *
   * Maclaurin series in Horner form over u = z²:
   *   Φ(z) = 0.5 + z · Σ_k a_k u^k,
   *   a_k = (−1)^k / (k!·2^k·(2k+1)·√(2π)).
   * With maxTerms = 25 the truncation error is < 1e-12 for |z| <= 3.5
   * (the alternating terms peak near k = z²/2 then decay factorially);
   * callers must standardize inputs into that range. Every literal is
   * CAST(x AS DOUBLE) because Spark SQL would otherwise parse decimal
   * literals as DECIMAL and diverge from DuckDB's doubles.
   */
  def phiSqlText(z: String, maxTerms: Int = 25): String = {
    val coefs = (0 until maxTerms).map { k =>
      var a = 1.0 / math.sqrt(2.0 * math.Pi)
      for (i <- 1 to k) a /= (2.0 * i)      // k! * 2^k
      a /= (2 * k + 1)
      if (k % 2 == 1) -a else a
    }
    def dlit(d: Double) = s"CAST(${java.lang.Double.toString(d)} AS DOUBLE)"
    val u = s"(($z) * ($z))"
    val horner = coefs.reverse.tail.foldLeft(dlit(coefs.last)) {
      (acc, c) => s"(${dlit(c)} + $u * ($acc))"
    }
    s"(CAST(0.5 AS DOUBLE) + ($z) * $horner)"
  }

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

  /**
   * GaussianStretch (ImageProcessingTools/GaussianStretch.java:
   * 196-325): histogram-match the raster onto a discretized standard
   * normal. The empirical CDF uses 50 000 equal-width bins over
   * [min, max]; the reference CDF is exp(-x²/2) over `numOutputBins`
   * points on [-cut, +cut], cumulated then normalized; each cell maps
   * to (first reference bin whose CDF exceeds its pVal) - 1, clamped
   * at 0 (the reference's scan loop collapses to exactly that count).
   * All shuffles are keyed by value bin; the reference table is a
   * `numOutputBins`-row broadcast. Arithmetic association mirrors the
   * Java source so the DuckDB oracle reproduces it bit-for-bit.
   */
  def gaussianStretch(grid: DataFrame, cutoffsInSD: Double = 3.0,
                      numOutputBins: Int = 1024): DataFrame = {
    val spark = grid.sparkSession
    val nb = 50000
    val stats = grid.agg(min("v").as("mn"), max("v").as("mx"),
      count(lit(1)).cast("double").as("n"))
    val binned = grid.crossJoin(broadcast(stats))
      .withColumn("bin", least(
        floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / nb))
          .cast("long"), lit(nb - 1L)))
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = binned.groupBy("bin").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(cum))
    // the 12-dp quantization of p and rp makes the <= comparison
    // decisive across engines: the Gaussian's symmetry puts rp
    // EXACTLY on the median cell's p = 0.5 up to 1 ulp of cumsum
    // rounding, and a raw <= flips the matched bin per engine
    val withP = binned.join(cdf.select("bin", "cum"), Seq("bin"))
      .withColumn("p", round(col("cum") / col("n"), 12))
    // reference CDF: x = i/(nb-1) * 2 * cut - cut (Java's left-assoc)
    val ref0 = spark.range(numOutputBins).withColumn("pdf",
      exp(-(col("id").cast("double") / (numOutputBins - 1) * 2
        * cutoffsInSD - cutoffsInSD)
        * (col("id").cast("double") / (numOutputBins - 1) * 2
          * cutoffsInSD - cutoffsInSD) / 2))
    // normalize by max(cumsum) (order-free), not an unordered float
    // re-sum — keeps every rp bit-identical between engines
    val refCum = ref0.withColumn("cumr",
      sum("pdf").over(Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val refCdf = refCum
      .crossJoin(broadcast(refCum.agg(max("cumr").as("tot"))))
      .select(col("id").as("ri"),
        round(col("cumr") / col("tot"), 12).as("rp"))
    withP.join(broadcast(refCdf), col("rp") <= col("p"), "left")
      .groupBy("r", "c")
      .agg(greatest(count(col("ri")) - 1, lit(0L)).as("gauss_bin"))
  }

  /**
   * SigmoidalStretch (ImageProcessingTools/SigmoidalStretch.java:
   * 195-215): z' = (z - min)/range mapped through a [0,1]-normalized
   * logistic, (1/(1+e^{gain(cutoff-z')}) - a)/b. Pure column
   * arithmetic over broadcast global stats.
   */
  def sigmoidalStretch(grid: DataFrame, cutoff: Double,
                       gain: Double): DataFrame = {
    val stats = grid.agg(min("v").as("mn"), max("v").as("mx"))
    val a = lit(1.0) / (lit(1.0) + exp(lit(gain) * lit(cutoff)))
    val b = lit(1.0) / (lit(1.0) + exp(lit(gain) * lit(cutoff - 1))) -
      lit(1.0) / (lit(1.0) + exp(lit(gain) * lit(cutoff)))
    val zn = (col("v") - col("mn")) / (col("mx") - col("mn"))
    grid.crossJoin(broadcast(stats))
      .select(col("r"), col("c"),
        round((lit(1.0) / (lit(1.0) + exp(lit(gain) * (lit(cutoff) - zn)))
          - a) / b, 6).as("sig"))
  }
}
