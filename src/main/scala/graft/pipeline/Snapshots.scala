package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-style snapshot/manifest layer over partitioned Parquet
 * (SURVEY.md §7.1 module 4/9): no Iceberg jar ships in this
 * environment, so snapshot isolation + per-partition lineage are
 * provided by a small manifest protocol:
 *
 *  - a stage writes each partition bucket independently to
 *    `<root>/<stage>/<snapshotId>/part=<k>/` and then commits a
 *    per-partition manifest line `part-<k>.json` (write-temp +
 *    ATOMIC_MOVE rename, replay-idempotent) carrying rowCount/bytes;
 *  - `resume` skips buckets whose manifest line exists — a killed job
 *    re-runs only incomplete buckets (0 recomputed completed
 *    partitions, the north-rule resume criterion);
 *  - `_SUCCESS.json` seals the snapshot with aggregate metrics.
 *
 * The reference analogue is the temp-raster chaining + cancel/resume
 * lifecycle of tools (WhiteboxRaster.isTemporaryFile,
 * WhiteboxGui.pluginComplete — SURVEY.md §2.11): every stage boundary
 * in the reference is a fully materialized file; here it is a sealed
 * snapshot directory with lineage.
 */
object Snapshots {

  case class PartMeta(part: Int, rows: Long, bytes: Long)

  private def manifestDir(root: String, stage: String,
                          snapshotId: Long): Path =
    Paths.get(root, stage, snapshotId.toString, "_manifest")

  private def dataDir(root: String, stage: String, snapshotId: Long,
                      part: Int): String =
    s"$root/$stage/$snapshotId/part=$part"

  def completedParts(root: String, stage: String,
                     snapshotId: Long): Set[Int] = {
    val dir = manifestDir(root, stage, snapshotId)
    if (!Files.exists(dir)) Set.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("part-") && s.endsWith(".json") =>
        s.stripPrefix("part-").stripSuffix(".json").toInt
      }.toSet
  }

  /** Atomically commit one partition's manifest line. Idempotent. */
  private def commitPart(root: String, stage: String, snapshotId: Long,
                         meta: PartMeta): Unit = {
    val dir = manifestDir(root, stage, snapshotId)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".part-${meta.part}.json.tmp")
    val fin = dir.resolve(s"part-${meta.part}.json")
    val json =
      s"""{"part": ${meta.part}, "rows": ${meta.rows}, "bytes": ${meta.bytes}}"""
    Files.write(tmp, json.getBytes(UTF_8))
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def dirBytes(p: Path): Long =
    if (!Files.exists(p)) 0L
    else Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  /**
   * Write `df` as one snapshot of `stage`, bucketed into `numParts`
   * by `hash(bucketExpr)`, committing each bucket's manifest line
   * after the data lands. Buckets already committed (from a previous
   * killed run) are filtered out BEFORE the write — their data is not
   * rewritten and not recomputed. Returns per-partition lineage.
   *
   * Scale shape: ONE Spark job writes every remaining bucket via
   * `partitionBy` with dynamic partition overwrite (a single scan of
   * the input, one writer task set), then manifests are committed
   * from the landed files — parquet-footer row counts, no data
   * re-read. The previous per-bucket loop cost numParts full input
   * scans; at 100 TB one snapshot write would have cost N x input.
   */
  def writeSnapshot(df: DataFrame, root: String, stage: String,
                    snapshotId: Long, bucketCol: String,
                    numParts: Int): Seq[PartMeta] = {
    val spark = df.sparkSession
    val done = completedParts(root, stage, snapshotId)
    val todo = (0 until numParts).filterNot(done.contains)
    val base = s"$root/$stage/$snapshotId"
    if (todo.nonEmpty) {
      df.withColumn("part",
          pmod(hash(col(bucketCol)), lit(numParts)))
        .where(col("part").isin(todo: _*))
        // write-side clustering (the north rule's explicit
        // repartitionByRange): one task per pending part with rows
        // range-clustered by the bucket key inside it — exactly one
        // file per part directory (instead of one per upstream task
        // per part) and parquet min/max column stats that let a
        // cell-range scan prune whole row groups
        .repartitionByRange(math.max(todo.size, 1),
          col("part"), col(bucketCol))
        .sortWithinPartitions(col("part"), col(bucketCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part")
        .parquet(base)
    }
    // manifest row counts from the landed files' parquet footers
    // (count() over a parquet scan is metadata-only), one small job
    val landed = todo.map(k => k -> dataDir(root, stage, snapshotId, k))
      .filter { case (_, p) => Files.exists(Paths.get(p)) }
    val countsByPart: Map[Int, Long] =
      if (landed.isEmpty) Map.empty
      else spark.read.option("basePath", base)
        .parquet(landed.map(_._2): _*)
        .groupBy(col("part")).count()
        .collect().map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    val metas = todo.map { k =>
      val meta = PartMeta(k, countsByPart.getOrElse(k, 0L),
        dirBytes(Paths.get(dataDir(root, stage, snapshotId, k))))
      commitPart(root, stage, snapshotId, meta)
      meta
    }
    // seal
    val all = completedParts(root, stage, snapshotId)
    if (all.size == numParts) {
      val dir = manifestDir(root, stage, snapshotId)
      val tmp = dir.resolve("._SUCCESS.json.tmp")
      Files.write(tmp,
        s"""{"snapshot": $snapshotId, "parts": $numParts}""".getBytes(UTF_8))
      Files.move(tmp, dir.resolve("_SUCCESS.json"),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    metas
  }

  def isSealed(root: String, stage: String, snapshotId: Long): Boolean =
    Files.exists(manifestDir(root, stage, snapshotId)
      .resolve("_SUCCESS.json"))

  /** Read a sealed snapshot back. */
  def readSnapshot(spark: SparkSession, root: String, stage: String,
                   snapshotId: Long): DataFrame =
    spark.read.parquet(s"$root/$stage/$snapshotId/part=*")
}
