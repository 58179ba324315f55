package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

import graft.core.CellIndex

/**
 * Custom Catalyst expressions for the cell index + geometry kernel
 * (SURVEY.md §4 item 1). All are deterministic, null-intolerant and
 * codegen as a single static call into [[GeoEval]]/[[CellIndex]], so
 * they stay inside whole-stage codegen spans.
 */

/** latlng_to_cell(lat, lon, res) -> Long cell id. */
case class LatLngToCell(lat: Expression, lon: Expression, res: Expression)
    extends TernaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(la: Any, lo: Any, r: Any): Any =
    CellIndex.latLngToCell(la.asInstanceOf[Double],
      lo.asInstanceOf[Double], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, r) =>
      s"graft.core.CellIndex.latLngToCell($la, $lo, $r)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** Unary cell accessors sharing one shape. */
abstract class CellUnary extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  protected def call: String
  protected def evalLong(c: Long): Any
  override protected def nullSafeEval(c: Any): Any =
    evalLong(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.CellIndex.$call($c)")
}

case class CellLatBin(child: Expression) extends CellUnary {
  override def dataType: DataType = LongType
  protected def call = "cellLatBin"
  protected def evalLong(c: Long): Any = CellIndex.cellLatBin(c)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class CellLonBin(child: Expression) extends CellUnary {
  override def dataType: DataType = LongType
  protected def call = "cellLonBin"
  protected def evalLong(c: Long): Any = CellIndex.cellLonBin(c)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class CellCenterLat(child: Expression) extends CellUnary {
  override def dataType: DataType = DoubleType
  protected def call = "cellCenterLat"
  protected def evalLong(c: Long): Any = CellIndex.cellCenterLat(c)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class CellCenterLon(child: Expression) extends CellUnary {
  override def dataType: DataType = DoubleType
  protected def call = "cellCenterLon"
  protected def evalLong(c: Long): Any = CellIndex.cellCenterLon(c)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** cell_to_parent(cell, parentRes). */
case class CellToParent(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, r: Any): Any =
    CellIndex.cellToParent(c.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) =>
      s"graft.core.CellIndex.cellToParent($c, $r)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

/** k_ring(cell, k) -> Array[Long] of the (2k+1)^2 block. */
case class KRing(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, k: Any): Any =
    GeoEval.kRing(c.asInstanceOf[Long], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k) => s"graft.expr.GeoEval.kRing($c, $k)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

/** cover_bbox(minLon, minLat, maxLon, maxLat, res) -> Array[Long]. */
case class CoverBBox(children: Seq[Expression]) extends Expression
    {
  require(children.length == 5)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def nullIntolerant: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GeoEval.coverBBox(vs(0).asInstanceOf[Double],
      vs(1).asInstanceOf[Double], vs(2).asInstanceOf[Double],
      vs(3).asInstanceOf[Double], vs(4).asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val nullCheck = cs.map(_.isNull).mkString(" || ")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${cs.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $nullCheck;
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.expr.GeoEval.coverBBox(${cs(0).value},
          ${cs(1).value}, ${cs(2).value}, ${cs(3).value}, ${cs(4).value});
      }""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/**
 * pip_contains(x, y, xs, ys, parts) — even-odd ray-cast PIP evaluated
 * directly over Tungsten arrays (no copies), the exact-test residual
 * predicate after the cell-id equi-join
 * (IsolateVectorFeaturesByLocation.java:360-611 semantics).
 */
case class PipContains(children: Seq[Expression]) extends Expression
    {
  require(children.length == 5)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def nullIntolerant: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GeoEval.pipContains(vs(0).asInstanceOf[Double],
      vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(3).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(4).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val nullCheck = cs.map(_.isNull).mkString(" || ")
    ev.copy(code = code"""
      ${cs.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $nullCheck;
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = graft.expr.GeoEval.pipContains(${cs(0).value},
          ${cs(1).value}, ${cs(2).value}, ${cs(3).value}, ${cs(4).value});
      }""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Shared shape for ternary geometry-array expressions. */
abstract class GeomTernary extends TernaryExpression {
  override def nullIntolerant: Boolean = true
  protected def call: String
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    evalArrays(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected def evalArrays(
      xs: org.apache.spark.sql.catalyst.util.ArrayData,
      ys: org.apache.spark.sql.catalyst.util.ArrayData,
      parts: org.apache.spark.sql.catalyst.util.ArrayData): Any
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.expr.GeoEval.$call($a, $b, $c)")
}

/** polygon_area(xs, ys, parts): |sum of signed ring areas|
  * (shapefile/Polygon.java:170 semantics, holes opposite winding). */
case class PolygonArea(first: Expression, second: Expression,
    third: Expression) extends GeomTernary {
  override def dataType: DataType = DoubleType
  protected def call = "polygonArea"
  protected def evalArrays(xs: org.apache.spark.sql.catalyst.util.ArrayData,
      ys: org.apache.spark.sql.catalyst.util.ArrayData,
      parts: org.apache.spark.sql.catalyst.util.ArrayData): Any =
    GeoEval.polygonArea(xs, ys, parts)
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** polygon_perimeter(xs, ys, parts) (shapefile/Polygon.java:177). */
case class PolygonPerimeter(first: Expression, second: Expression,
    third: Expression) extends GeomTernary {
  override def dataType: DataType = DoubleType
  protected def call = "polygonPerimeter"
  protected def evalArrays(xs: org.apache.spark.sql.catalyst.util.ArrayData,
      ys: org.apache.spark.sql.catalyst.util.ArrayData,
      parts: org.apache.spark.sql.catalyst.util.ArrayData): Any =
    GeoEval.polygonPerimeter(xs, ys, parts)
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** buffer_point_area(x, y, dist): area of the JTS point buffer
  * (BufferVector delegation, VectorTools/BufferVector.java:359+). */
case class BufferPointArea(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(x: Any, y: Any, d: Any): Any =
    GeoEval.bufferPointArea(x.asInstanceOf[Double],
      y.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, d) =>
      s"graft.expr.GeoEval.bufferPointArea($x, $y, $d)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** clip_area_rect(xs, ys, parts, minX, minY, maxX, maxY): area of the
  * JTS intersection with an axis-aligned clip rectangle
  * (Clip.java:240-460 per-record intersection semantics). */
case class ClipAreaRect(children: Seq[Expression]) extends Expression {
  require(children.length == 7)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def nullIntolerant: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GeoEval.clipAreaWithRect(
      vs(0).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(2).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(3).asInstanceOf[Double], vs(4).asInstanceOf[Double],
      vs(5).asInstanceOf[Double], vs(6).asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val nullCheck = cs.map(_.isNull).mkString(" || ")
    ev.copy(code = code"""
      ${cs.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $nullCheck;
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        ${ev.value} = graft.expr.GeoEval.clipAreaWithRect(${cs(0).value},
          ${cs(1).value}, ${cs(2).value}, ${cs(3).value}, ${cs(4).value},
          ${cs(5).value}, ${cs(6).value});
      }""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** overlay_geom(op, xsA, ysA, partsA, xsB, ysB, partsB): JTS binary
  * overlay with geometry output — the geometry-producing core of the
  * Clip/Intersect/Union/Difference/SymmetricDifference family
  * (VectorTools; Clip.java:240-460, Intersect.java:297-299,
  * Difference.java:332-334). Returns a struct (xs, ys, parts, area,
  * minx, miny, maxx, maxy), null when the result is empty. */
case class OverlayGeom(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 7)
  override def dataType: DataType = OverlayGeom.schema
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GeoEval.overlayGeom(vs(0).asInstanceOf[Int],
      vs(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(2).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(3).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(4).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(5).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(6).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object OverlayGeom {
  val schema: StructType = StructType(Seq(
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false)),
    StructField("parts", ArrayType(IntegerType, containsNull = false)),
    StructField("area", DoubleType),
    StructField("minx", DoubleType), StructField("miny", DoubleType),
    StructField("maxx", DoubleType), StructField("maxy", DoubleType)))
}

/** st_pred(predCode, xsA, ysA, partsA, xsB, ysB, partsB): the DE-9IM
  * predicate menu (intersects/within/contains/covers/coveredBy/
  * touches/crosses/overlaps/equals) the reference evaluates per pair
  * in IsolateVectorFeaturesByLocation.java:360-726, delegated to JTS
  * exactly as the reference does. */
case class StPred(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 7)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GeoEval.stPred(vs(0).asInstanceOf[Int],
      vs(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(2).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(3).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(4).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(5).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(6).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** arr_dot(a, b) -> Double: sequential-fold dot product of two
  * numeric arrays (float or double elements), allocation-free and
  * codegen'd — the hot inner kernel of the ANN similarity family. */
case class ArrDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private lazy val fn =
    left.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "dotF"
      case _ => "dotD"
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (fn == "dotF") GeoEval.dotF(aa, bb) else GeoEval.dotD(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.GeoEval.$fn($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

/** sig_bands(arr, nPlanes, bandBits) -> Array[Long]: random-hyperplane
  * LSH band keys over a dense double array, one codegen'd pass
  * (kernel: [[GeoEval.sigBands]]; replaces the interpreted
  * transform/aggregate HOF fold in cosine near-dup). */
case class SigBands(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, n: Any, b: Any): Any =
    GeoEval.sigBands(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, n, b) => s"graft.expr.GeoEval.sigBands($a, $n, $b)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** to_wkt(xs, ys, parts) -> WKT string (ExportWellKnownText.java
  * delegation to JTS WKTWriter). */
case class ToWkt(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.core.Jts.toWkt(
        a.asInstanceOf[ArrayData].toDoubleArray(),
        b.asInstanceOf[ArrayData].toDoubleArray(),
        c.asInstanceOf[ArrayData].toIntArray()))
  }
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** from_wkt(wkt) -> struct(xs, ys, parts) in shapefile winding
  * (ImportWellKnownText.groovy delegation to JTS WKTReader). */
case class FromWkt(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false)),
    StructField("parts", ArrayType(IntegerType, containsNull = false))))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(w: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val g = graft.core.Jts.fromWkt(w.toString)
    val (xs, ys, parts) = graft.core.Jts.toPartsArrays(g)
    new GenericInternalRow(Array[Any](ArrayData.toArrayData(xs),
      ArrayData.toArrayData(ys), ArrayData.toArrayData(parts)))
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Column-level API + SQL registration. */
object GeoFunctions {
  private def c(e: Expression): Column = Bridge.column(e)
  private def x(col: Column): Expression = Bridge.expression(col)

  def latlng_to_cell(lat: Column, lon: Column, res: Column): Column =
    c(LatLngToCell(x(lat), x(lon), x(res)))
  def cell_lat_bin(cell: Column): Column = c(CellLatBin(x(cell)))
  def cell_lon_bin(cell: Column): Column = c(CellLonBin(x(cell)))
  def cell_center_lat(cell: Column): Column = c(CellCenterLat(x(cell)))
  def cell_center_lon(cell: Column): Column = c(CellCenterLon(x(cell)))
  def cell_to_parent(cell: Column, res: Column): Column =
    c(CellToParent(x(cell), x(res)))
  def k_ring(cell: Column, k: Column): Column = c(KRing(x(cell), x(k)))
  def cover_bbox(minLon: Column, minLat: Column, maxLon: Column,
                 maxLat: Column, res: Column): Column =
    c(CoverBBox(Seq(x(minLon), x(minLat), x(maxLon), x(maxLat), x(res))))
  def pip_contains(px: Column, py: Column, xs: Column, ys: Column,
                   parts: Column): Column =
    c(PipContains(Seq(x(px), x(py), x(xs), x(ys), x(parts))))
  def polygon_area(xs: Column, ys: Column, parts: Column): Column =
    c(PolygonArea(x(xs), x(ys), x(parts)))
  def polygon_perimeter(xs: Column, ys: Column, parts: Column): Column =
    c(PolygonPerimeter(x(xs), x(ys), x(parts)))
  def buffer_point_area(px: Column, py: Column, dist: Column): Column =
    c(BufferPointArea(x(px), x(py), x(dist)))
  def clip_area_rect(xs: Column, ys: Column, parts: Column,
                     minX: Column, minY: Column, maxX: Column,
                     maxY: Column): Column =
    c(ClipAreaRect(Seq(x(xs), x(ys), x(parts), x(minX), x(minY),
      x(maxX), x(maxY))))
  def overlay_geom(op: Column, xsA: Column, ysA: Column, partsA: Column,
                   xsB: Column, ysB: Column, partsB: Column): Column =
    c(OverlayGeom(Seq(x(op), x(xsA), x(ysA), x(partsA), x(xsB), x(ysB),
      x(partsB))))
  def st_pred(pred: Column, xsA: Column, ysA: Column, partsA: Column,
              xsB: Column, ysB: Column, partsB: Column): Column =
    c(StPred(Seq(x(pred), x(xsA), x(ysA), x(partsA), x(xsB), x(ysB),
      x(partsB))))
  def arr_dot(a: Column, b: Column): Column = c(ArrDot(x(a), x(b)))
  def sig_bands(a: Column, nPlanes: Column, bandBits: Column): Column =
    c(SigBands(x(a), x(nPlanes), x(bandBits)))
  def to_wkt(xs: Column, ys: Column, parts: Column): Column =
    c(ToWkt(x(xs), x(ys), x(parts)))
  def from_wkt(wkt: Column): Column = c(FromWkt(x(wkt)))

  /** Register all functions for SQL use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("latlng_to_cell",
      es => LatLngToCell(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("cell_lat_bin",
      es => CellLatBin(es.head), "built-in")
    reg.createOrReplaceTempFunction("cell_lon_bin",
      es => CellLonBin(es.head), "built-in")
    reg.createOrReplaceTempFunction("cell_center_lat",
      es => CellCenterLat(es.head), "built-in")
    reg.createOrReplaceTempFunction("cell_center_lon",
      es => CellCenterLon(es.head), "built-in")
    reg.createOrReplaceTempFunction("cell_to_parent",
      es => CellToParent(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("k_ring",
      es => KRing(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cover_bbox",
      es => CoverBBox(es), "built-in")
    reg.createOrReplaceTempFunction("pip_contains",
      es => PipContains(es), "built-in")
    reg.createOrReplaceTempFunction("polygon_area",
      es => PolygonArea(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("polygon_perimeter",
      es => PolygonPerimeter(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("buffer_point_area",
      es => BufferPointArea(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("clip_area_rect",
      es => ClipAreaRect(es), "built-in")
    reg.createOrReplaceTempFunction("overlay_geom",
      es => OverlayGeom(es), "built-in")
    reg.createOrReplaceTempFunction("st_pred",
      es => StPred(es), "built-in")
  }
}
