package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Geometry-restructure family (VectorTools ExtractNodes.java,
 * PolygonsToLines.java, Scripts/MultipartsToSingleparts.groovy /
 * SinglepartsToMultiparts, LinesToPolygons.groovy; SURVEY.md §2.6
 * "geometry restructure" row) over the engine's vertex-array vector
 * model (fid, xs: Array[Double], ys: Array[Double], parts:
 * Array[Int] — the ShapeFile parts-offset encoding). All reshapes
 * are per-feature flatMap/array transforms: no shuffle at all except
 * the explicit groupBy in singleparts->multiparts, so they scale
 * linearly with the feature table.
 */
object VectorReshape {

  /** ExtractNodes: every vertex of every feature becomes a point
    * feature (fid, vi, x, y) — vertex order preserved. */
  def extractNodes(features: DataFrame): DataFrame =
    features
      .select(col("fid"), posexplode(arrays_zip(col("xs"), col("ys"))))
      .select(col("fid"), col("pos").cast("long").as("vi"),
        col("col.xs").as("x"), col("col.ys").as("y"))

  /** Next-vertex 1-based index around the closed ring: vertex i
    * (0-based) connects to (i+1) mod n. */
  private val NextIdx = "CAST((i + 1) % size(xs) + 1 AS INT)"
  private val CurIdx = "CAST(i + 1 AS INT)"

  /** PolygonsToLines: each polygon ring re-tagged as a CLOSED
    * polyline — emits per feature the closed vertex count and the
    * ring length (sum of segment lengths in vertex order, closing
    * segment last). */
  def polygonsToLines(features: DataFrame): DataFrame = {
    val segLen = expr(
      s"""aggregate(sequence(0, size(xs) - 1), CAST(0.0 AS DOUBLE),
         |  (acc, i) -> acc + sqrt(
         |    (element_at(xs, $NextIdx) - element_at(xs, $CurIdx)) *
         |    (element_at(xs, $NextIdx) - element_at(xs, $CurIdx)) +
         |    (element_at(ys, $NextIdx) - element_at(ys, $CurIdx)) *
         |    (element_at(ys, $NextIdx) - element_at(ys, $CurIdx))))""".stripMargin)
    features.select(col("fid"),
      (size(col("xs")) + 1).cast("long").as("n_vertices"),
      round(segLen, 6).as("len"))
  }

  /** LinesToPolygons: closed polylines become polygons — emits the
    * shoelace area |sum x_i*y_{i+1} - x_{i+1}*y_i| / 2 over the
    * closed ring, vertex order fixed. */
  def linesToPolygons(features: DataFrame): DataFrame = {
    val shoelace = expr(
      s"""aggregate(sequence(0, size(xs) - 1), CAST(0.0 AS DOUBLE),
         |  (acc, i) -> acc +
         |    (element_at(xs, $CurIdx) * element_at(ys, $NextIdx) -
         |     element_at(xs, $NextIdx) * element_at(ys, $CurIdx)))""".stripMargin)
    features.select(col("fid"), round(abs(shoelace) / 2.0, 6).as("parea"))
  }

  /**
   * SinglepartsToMultiparts then MultipartsToSingleparts round-trip:
   * features grouped by `gid` are concatenated into one multipart
   * feature (vertex arrays appended in fid order, parts = start
   * offsets), then the multipart is exploded back into its parts.
   * Emits per part (gid, part_idx, bbox area) — a faithful exercise
   * of the ShapeFile parts-offset encode/decode.
   */
  def multipartRoundTrip(features: DataFrame, groups: Int): DataFrame = {
    val multi = features
      .withColumn("gid", col("fid") % groups)
      .groupBy("gid")
      .agg(sort_array(collect_list(
        struct(col("fid"), col("xs"), col("ys")))).as("ms"))
      .select(col("gid"),
        expr("flatten(transform(ms, m -> m.xs))").as("xs"),
        expr("flatten(transform(ms, m -> m.ys))").as("ys"),
        expr("""aggregate(ms, array(0),
          | (acc, m) -> array_append(acc, element_at(acc, -1) + size(m.xs)))""".stripMargin)
          .as("offs"))
    // offs has nParts+1 entries (last = total vertex count); the
    // exploded `col` is the part's start offset, pos its index
    multi
      .select(col("gid"), col("xs"), col("ys"), col("offs"),
        posexplode(expr("slice(offs, 1, size(offs) - 1)")))
      .select(col("gid"), col("pos").cast("long").as("part_idx"),
        expr("slice(xs, col + 1, element_at(offs, CAST(pos + 2 AS INT)) - col)")
          .as("pxs"),
        expr("slice(ys, col + 1, element_at(offs, CAST(pos + 2 AS INT)) - col)")
          .as("pys"))
      .select(col("gid"), col("part_idx"),
        round((array_max(col("pxs")) - array_min(col("pxs"))) *
          (array_max(col("pys")) - array_min(col("pys"))), 6).as("parea"))
  }

  /**
   * RemovePolygonNecks (VectorTools/RemovePolygonNecks.java:285-388):
   * a ring vertex is a neck vertex when the ring folds back on itself
   * nearby — its within-radius neighbour set spans two separated
   * index runs, detected as a max consecutive-index gap >=
   * nodeGapThreshold after the ring-seam normalisation (indices below
   * numPoints/2 shift up by numPoints when the raw index range spans
   * the whole ring, :327-345). Chains of consecutive neck vertices
   * are the emitted polylines; a chain needs >= 2 vertices, or any
   * length when it ends at the ring's last vertex (the reference's
   * end-of-scan flush, :364-372). The global chain window is
   * per-feature in the reference too — one ring, one partition.
   * vertices: (vid, vx, vy). Output: (chain_start, chain_end,
   * n_vertices).
   */
  def polygonNecks(vertices: DataFrame, radius: Double,
                   nodeGapThreshold: Long,
                   numPoints: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val d2 = radius * radius
    val a = vertices.select(col("vid").as("cid"), col("vx").as("ax"),
      col("vy").as("ay"))
    val b = vertices.select(col("vid").as("nid"), col("vx").as("bx"),
      col("vy").as("by"))
    val nb = a.join(b,
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")) <= d2)
      .select(col("cid"), col("nid"))
      .localCheckpoint(true)
    val rng = nb.groupBy("cid")
      .agg((max("nid") - min("nid")).as("rng"))
    val nrm = nb.join(rng, Seq("cid"))
      .select(col("cid"),
        when(col("rng") === numPoints - 1 &&
          col("nid") < numPoints / 2, col("nid") + numPoints)
          .otherwise(col("nid")).as("nid"))
    val wC = w.partitionBy("cid").orderBy("nid")
    val mg = nrm
      .withColumn("gp", col("nid") - lag("nid", 1).over(wC))
      .groupBy("cid").agg(coalesce(max("gp"), lit(0L)).as("maxgap"))
    val kept = mg.where(col("maxgap") >= nodeGapThreshold)
      .select("cid")
    kept.withColumn("grp", col("cid") - row_number().over(w.orderBy("cid")))
      .groupBy("grp")
      .agg(min("cid").as("chain_start"), max("cid").as("chain_end"),
        count(lit(1)).as("n_vertices"))
      .where(col("n_vertices") >= 2 ||
        col("chain_end") === numPoints - 1)
      .select("chain_start", "chain_end", "n_vertices")
  }

  /**
   * DeleteSmallLakesAndExtendRivers.groovy (:138-177): a lake with
   * area <= areaThreshold that has >= 2 stream endpoints (starts or
   * ends) within searchDistance is deleted, and each such endpoint is
   * replaced by the lake's interior point; when an endpoint qualifies
   * against several lakes, the reference's sequential overwrite makes
   * the highest lake id win. Lakes here are axis-aligned rectangles
   * (lake_id, xmin, ymin, xmax, ymax, cx, cy) so point-to-lake
   * distance is the closed form GREATEST(xmin-p, 0, p-xmax) per axis
   * — plain codegen'd columns on both engines, no geometry library in
   * the hot path (the general-polygon arm reuses the JTS overlay
   * family). `endpoints`: (line_id, kind 0=start/1=end, px, py).
   *
   * Scale: lakes are the small dimension — broadcast — and the only
   * shuffles are the per-lake count and per-endpoint pick; endpoint
   * cardinality is 2x the stream table, never pairs x pairs.
   *
   * Returns (line_id, kind, cx, cy): the endpoints to rewrite and
   * the interior point that replaces them.
   */
  def extendRivers(lakes: DataFrame, endpoints: DataFrame,
                   searchDistance: Double,
                   areaThreshold: Double): DataFrame = {
    val d2 = searchDistance * searchDistance
    val gx = greatest(col("xmin") - col("px"), lit(0.0),
      col("px") - col("xmax"))
    val gy = greatest(col("ymin") - col("py"), lit(0.0),
      col("py") - col("ymax"))
    val near = endpoints.join(broadcast(lakes),
        gx * gx + gy * gy < d2)
      .select(col("line_id"), col("kind"), col("lake_id"),
        col("cx"), col("cy"),
        ((col("xmax") - col("xmin")) *
          (col("ymax") - col("ymin"))).as("area"))
      .localCheckpoint(true)
    val qual = near.groupBy("lake_id")
      .agg(count(lit(1)).as("n"), min(col("area")).as("area"))
      .where(col("n") >= 2 && col("area") <= areaThreshold)
      .select("lake_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("line_id", "kind")
      .orderBy(col("lake_id").desc)
    near.join(qual, Seq("lake_id"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("line_id"), col("kind"), col("cx"), col("cy"))
  }

  /**
   * Smooth (VectorTools/Smooth.java:268-305): per-vertex moving
   * average over a window of 2·halfFilter+1 ring positions. Closed
   * rings wrap (the reference's duplicate-closing-vertex index
   * arithmetic collapses to plain mod-n on the engine's open vertex
   * lists); open lines clamp at the ends, dividing by the in-range
   * count. One explode + windowed join per vertex — shuffles only on
   * (gid, i), linear in total vertex count.
   * verts: (gid, i, vx, vy) with i 0-based ring order.
   */
  def smoothVertices(verts: DataFrame, halfFilter: Int,
                     closed: Boolean): DataFrame = {
    val spark = verts.sparkSession
    import spark.implicits._
    val offs = (-halfFilter to halfFilter).toDF("o")
    val sized = verts.join(
      verts.groupBy("gid").agg(count(lit(1)).as("n")), Seq("gid"))
    val probes = sized.crossJoin(broadcast(offs))
      .select(col("gid"), col("i"),
        (if (closed) pmod(col("i") + col("o"), col("n"))
         else col("i") + col("o")).as("j"))
      .where(col("j") >= 0)
    probes
      .join(verts.select(col("gid"), col("i").as("j"),
        col("vx").as("nx"), col("vy").as("ny")), Seq("gid", "j"))
      .groupBy("gid", "i")
      .agg(round(sum(col("nx")) / count(lit(1)), 6).as("sx"),
        round(sum(col("ny")) / count(lit(1)), 6).as("sy"))
  }

  /**
   * VectorCleaning (VectorTools/VectorCleaning.java:300-310, which
   * delegates to JTS GeometrySnapper pairwise in record order): every
   * vertex snaps to the nearest OTHER-feature vertex within
   * `tolerance`, ties broken by (gid, i) scan order; out-of-range
   * vertices stay put. The engine's form is order-free (nearest
   * wins, not last-snapped-pair wins) — deterministic and
   * relational: a self-join bounded by the tolerance window, then a
   * first-row rank. At scale the join keys by cell id like every
   * other proximity join here.
   */
  def vectorClean(verts: DataFrame, tolerance: Double): DataFrame = {
    val cand = verts
      .join(verts.select(col("gid").as("g2"), col("i").as("i2"),
          col("vx").as("x2"), col("vy").as("y2")),
        col("g2") =!= col("gid") &&
          abs(col("x2") - col("vx")) <= tolerance &&
          abs(col("y2") - col("vy")) <= tolerance)
      .withColumn("d2",
        (col("x2") - col("vx")) * (col("x2") - col("vx")) +
          (col("y2") - col("vy")) * (col("y2") - col("vy")))
      .where(col("d2") <= tolerance * tolerance)
    val firstNear = org.apache.spark.sql.expressions.Window
      .partitionBy("gid", "i")
      .orderBy(col("d2"), col("g2"), col("i2"))
    val snapped = cand.withColumn("rn", row_number().over(firstNear))
      .where(col("rn") === 1)
      .select(col("gid"), col("i"), col("x2"), col("y2"))
    verts.join(snapped, Seq("gid", "i"), "left")
      .select(col("gid"), col("i"),
        coalesce(col("x2"), col("vx")).as("cx"),
        coalesce(col("y2"), col("vy")).as("cy"))
  }
}
