package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.Jts
import graft.expr.GeoFunctions._

/** Ring/part geometry payload for typed overlay stages. */
case class GeomArrays(xs: Seq[Double], ys: Seq[Double], parts: Seq[Int])

/** Tree-reduce node: a partial union tagged with its reduce-group id. */
case class KeyedGeom(g: Long, xs: Seq[Double], ys: Seq[Double],
                     parts: Seq[Int])

/** A polygon feature with dissolved-overlay output geometry. */
case class OverlayFeature(fid: Long, xs: Seq[Double], ys: Seq[Double],
                          parts: Seq[Int], area: Double, minx: Double,
                          miny: Double, maxx: Double, maxy: Double)

private case class ClipGroup(fid: Long, xs: Seq[Double], ys: Seq[Double],
                             parts: Seq[Int], clips: Seq[GeomArrays])

/**
 * Vector overlay with GEOMETRY output (SURVEY.md §2.3.1) — the
 * Clip / Intersect / Union / Difference / SymmetricDifference family
 * (VectorTools, each ~550-940 LoC of JTS delegation) re-expressed as
 * cell-keyed joins + the `overlay_geom` Catalyst expression.
 *
 * Layer layout (both sides): (fid: Long, xs: Array[Double],
 * ys: Array[Double], parts: Array[Int], min_x, min_y, max_x, max_y).
 * Output rings use shapefile winding (shells CW, holes CCW).
 *
 * Scale design: candidate pairs come from an equi-join on covering
 * cells (the reference's bbox prefilter, Clip.java:281, pushed into
 * the shuffle key), exact JTS overlay runs per surviving pair only.
 */
object VectorOverlay {

  private def keyed(df: DataFrame, res: Int): DataFrame =
    df.withColumn("__cell", explode(cover_bbox(
      col("min_x"), col("min_y"), col("max_x"), col("max_y"), lit(res))))

  private def bboxOverlap = // cheap pretest before the exact overlay
    col("min_x") <= col("b_max_x") && col("max_x") >= col("b_min_x") &&
    col("min_y") <= col("b_max_y") && col("max_y") >= col("b_min_y")

  private def candidatePairs(a: DataFrame, b: DataFrame,
                             res: Int): DataFrame = {
    val bb = keyed(b, res).select(col("__cell"),
      col("fid").as("b_fid"), col("xs").as("b_xs"),
      col("ys").as("b_ys"), col("parts").as("b_parts"),
      col("min_x").as("b_min_x"), col("min_y").as("b_min_y"),
      col("max_x").as("b_max_x"), col("max_y").as("b_max_y"))
    keyed(a, res).join(bb, Seq("__cell"))
      .where(bboxOverlap)
      .dropDuplicates("fid", "b_fid")
  }

  /**
   * Pairwise overlay: Intersect (op 0) / Difference per pair (2) /
   * SymmetricDifference (3) — Intersect.java:297-299,
   * Difference.java:332-334, SymmetricDifference.java:330-332.
   * Empty results are dropped like the reference's tools.
   */
  def overlayPairs(a: DataFrame, b: DataFrame, res: Int,
                   op: Int): DataFrame =
    candidatePairs(a, b, res)
      .withColumn("g", overlay_geom(lit(op), col("xs"), col("ys"),
        col("parts"), col("b_xs"), col("b_ys"), col("b_parts")))
      .where(col("g").isNotNull)
      .select(col("fid").as("a_fid"), col("b_fid"),
        col("g.xs").as("oxs"), col("g.ys").as("oys"),
        col("g.parts").as("oparts"), col("g.area").as("area"),
        col("g.minx").as("ominx"), col("g.miny").as("ominy"),
        col("g.maxx").as("omaxx"), col("g.maxy").as("omaxy"))

  private def groupedOverlay(data: DataFrame, clipLayer: DataFrame,
                             res: Int, op: Int,
                             keepUnmatched: Boolean): Dataset[OverlayFeature] = {
    val spark = data.sparkSession
    import spark.implicits._
    val pairs = candidatePairs(data, clipLayer, res)
      .groupBy(col("fid"))
      .agg(first(col("xs")).as("xs"), first(col("ys")).as("ys"),
        first(col("parts")).as("parts"),
        collect_list(struct(col("b_xs").as("xs"), col("b_ys").as("ys"),
          col("b_parts").as("parts"))).as("clips"))
    val matched = pairs.as[ClipGroup].flatMap { g =>
      val geom = Jts.toGeometry(g.xs.toArray, g.ys.toArray,
        g.parts.toArray)
      val region = Jts.unionAll(g.clips.map(cg =>
        Jts.toGeometry(cg.xs.toArray, cg.ys.toArray, cg.parts.toArray)))
      val out = Jts.overlay(op, geom, region)
      if (out.isEmpty || out.getArea == 0.0) None
      else {
        val (xs, ys, parts) = Jts.toPartsArrays(out)
        val env = out.getEnvelopeInternal
        Some(OverlayFeature(g.fid, xs.toSeq, ys.toSeq, parts.toSeq,
          out.getArea, env.getMinX, env.getMinY, env.getMaxX,
          env.getMaxY))
      }
    }
    if (!keepUnmatched) matched
    else {
      val untouched = data
        .join(candidatePairs(data, clipLayer, res)
          .select(col("fid")).distinct(), Seq("fid"), "left_anti")
        .select(col("fid"), col("xs"), col("ys"), col("parts"),
          polygon_area(col("xs"), col("ys"), col("parts")).as("area"),
          col("min_x").as("minx"), col("min_y").as("miny"),
          col("max_x").as("maxx"), col("max_y").as("maxy"))
        .as[OverlayFeature]
      matched.unionByName(untouched)
    }
  }

  /**
   * DE-9IM predicate evaluation per candidate pair — evaluates the
   * whole predicate menu the reference parses at
   * IsolateVectorFeaturesByLocation.java:240-262 in ONE pass over the
   * cell-keyed candidates. Output: (a_fid, b_fid) + one boolean per
   * requested predicate (named by caller).
   */
  def predicatePairs(a: DataFrame, b: DataFrame, res: Int,
                     preds: Seq[(String, Int)]): DataFrame = {
    val base = candidatePairs(a, b, res)
    val withPreds = preds.foldLeft(base) { case (df, (name, code)) =>
      df.withColumn(name, st_pred(lit(code), col("xs"), col("ys"),
        col("parts"), col("b_xs"), col("b_ys"), col("b_parts")))
    }
    withPreds.select((col("fid").as("a_fid") +: col("b_fid") +:
      preds.map(p => col(p._1))): _*)
  }

  /**
   * Spatial predicate SEMI / ANTI join — the reference's "isolate" vs
   * "remove features from" modes (IsolateVectorFeaturesByLocation
   * .java:232-236): keep data features that match (semi) or don't
   * match (anti) some feature of `b` under the predicate.
   */
  def predicateJoin(a: DataFrame, b: DataFrame, res: Int, pred: Int,
                    anti: Boolean): DataFrame = {
    val matched = candidatePairs(a, b, res)
      .where(st_pred(lit(pred), col("xs"), col("ys"), col("parts"),
        col("b_xs"), col("b_ys"), col("b_parts")))
      .select("fid").distinct()
    a.join(matched, Seq("fid"), if (anti) "left_anti" else "left_semi")
  }

  /**
   * Clip (Clip.java:240-460): each data feature intersected with the
   * UNION of the clip polygons overlapping it (the reference unions
   * the clip region first, :253-296). Features outside every clip
   * polygon are dropped.
   */
  def clip(data: DataFrame, clipLayer: DataFrame, res: Int): DataFrame =
    groupedOverlay(data, clipLayer, res, Jts.OpIntersection,
      keepUnmatched = false).toDF()

  /**
   * Difference / Erase (Difference.java:332-334): each data feature
   * minus the union of overlapping erase polygons; features touching
   * nothing pass through unchanged.
   */
  def erase(data: DataFrame, eraseLayer: DataFrame, res: Int): DataFrame =
    groupedOverlay(data, eraseLayer, res, Jts.OpDifference,
      keepUnmatched = true).toDF()

  /**
   * Dissolve / coverage Union (Union.java; BufferVector's implicit
   * dissolve): n-ary union of all features, fully on executors.
   *
   * Scale design — TREE reduce: level 0 unions each input partition
   * in place (no shuffle), then log_fanout(numPartitions) rounds of
   * groupByKey(g / fanout) merge partial coverages pairwise-ish, so
   * no single task (and never the driver) sees more than `fanout`
   * partial unions at once. The final part explosion runs in the last
   * reduce task; fid = rank of the part bbox (deterministic — JTS
   * union output geometry is order-independent as a point set, and
   * parts of a coverage are disjoint so the bbox sort is total).
   */
  def dissolve(features: DataFrame, fanout: Int = 16): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val src = features.select(col("xs"), col("ys"), col("parts"))
      .as[GeomArrays]
    var width = src.rdd.getNumPartitions
    var cur = spark.createDataset(
      src.rdd.mapPartitionsWithIndex { (pid, it) =>
        val gs = it.map(g =>
          Jts.toGeometry(g.xs.toArray, g.ys.toArray, g.parts.toArray))
          .toSeq
        if (gs.isEmpty) Iterator.empty
        else {
          val (xs, ys, parts) = Jts.toPartsArrays(Jts.unionAll(gs))
          Iterator.single(
            KeyedGeom(pid.toLong, xs.toSeq, ys.toSeq, parts.toSeq))
        }
      })
    while (width > 1) {
      cur = cur.groupByKey(_.g / fanout)
        .mapGroups { (g, it) =>
          val gs = it.map(k =>
            Jts.toGeometry(k.xs.toArray, k.ys.toArray, k.parts.toArray))
            .toSeq
          val (xs, ys, parts) = Jts.toPartsArrays(Jts.unionAll(gs))
          KeyedGeom(g, xs.toSeq, ys.toSeq, parts.toSeq)
        }
      width = (width + fanout - 1) / fanout
    }
    val parts = cur.flatMap { k =>
      val merged = Jts.toGeometry(k.xs.toArray, k.ys.toArray,
        k.parts.toArray)
      Jts.polygonsOf(merged).map { p =>
        val (xs, ys, pp) = Jts.toPartsArrays(p)
        val env = p.getEnvelopeInternal
        (xs.toSeq, ys.toSeq, pp.toSeq, p.getArea,
          env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
      }
    }.toDF("xs", "ys", "parts", "area", "minx", "miny", "maxx", "maxy")
    parts
      .withColumn("fid", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("minx"), col("miny"), col("maxx"), col("maxy")))
        .cast("long"))
      .select(col("fid"), col("xs"), col("ys"), col("parts"),
        col("area"), col("minx"), col("miny"), col("maxx"), col("maxy"))
  }

  /** Fuse (reference Fuse overlay mode): union two layers, then
    * coverage-dissolve the combined set — composition of
    * `unionByName` and [[dissolve]]. */
  def fuse(a: DataFrame, b: DataFrame, fanout: Int = 16): DataFrame =
    dissolve(
      a.select(col("xs"), col("ys"), col("parts"))
        .unionByName(b.select(col("xs"), col("ys"), col("parts"))),
      fanout)
}
