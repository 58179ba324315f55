package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.expr.{CoverBBox, LatLngToCell, PipContains}

/**
 * Optimizer rule (SURVEY.md §4 item 2): lets users write the fully
 * declarative form
 *
 *   points.join(zones, pip_contains(x, y, xs, ys, parts))
 *
 * — which Spark would otherwise execute as a BroadcastNestedLoopJoin
 * (every point against every zone) — and rewrites it into the
 * cell-keyed equi-join the engine uses everywhere: point side gains
 * `latlng_to_cell(y, x, res)`, polygon side is exploded over
 * `cover_bbox(min(xs), min(ys), max(xs), max(ys), res)`, the join
 * becomes a hash join on the cell id with the exact ray-cast PIP as a
 * residual predicate. This is the declarative analogue of
 * SpatialJoins.pipJoin, and the engine's answer to the reference's
 * bbox-prefilter tactic (Clip.java:281) as an automatic plan rewrite.
 *
 * Activate per session with
 *   spark.experimental.extraOptimizations ++= Seq(PipJoinRewrite)
 * or via --conf spark.sql.extensions=graft.plans.GraftExtensions.
 */
object PipJoinRewrite extends Rule[LogicalPlan] {

  val CellRes = 7
  private val LeftCell = "__pip_cell_l"
  private val RightCell = "__pip_cell_r"

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if findPip(cond).isDefined && !alreadyRewritten(left) =>
      val pip = findPip(cond).get
      val Seq(px, py, xs, ys, parts) = pip.children
      val pointSideLeft = px.references.subsetOf(left.outputSet) &&
        py.references.subsetOf(left.outputSet) &&
        xs.references.subsetOf(right.outputSet) &&
        ys.references.subsetOf(right.outputSet) &&
        parts.references.subsetOf(right.outputSet)
      if (!pointSideLeft) j
      else {
        val cellL = Alias(
          LatLngToCell(py, px, Literal(CellRes)), LeftCell)()
        val newLeft = Project(left.output :+ cellL, left)
        val cover = CoverBBox(Seq(
          ArrayMin(xs), ArrayMin(ys), ArrayMax(xs), ArrayMax(ys),
          Literal(CellRes)))
        val cellR = AttributeReference(RightCell, LongType,
          nullable = false)()
        val gen = Generate(Explode(cover), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(cellR), child = right)
        val newCond = And(EqualTo(cellL.toAttribute, cellR), cond)
        Project(j.output,
          Join(newLeft, gen, Inner, Some(newCond), hint))
      }
  }

  /** The PipContains must itself be a top-level conjunct: a PIP under
    * Or/Not (e.g. `pip_contains(...) || dist < r`) does NOT imply the
    * cell-equality — ANDing the cell key onto such a join would drop
    * rows that match via the other disjunct. */
  private def findPip(cond: Expression): Option[PipContains] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).collectFirst { case p: PipContains => p }
  }

  private def alreadyRewritten(left: LogicalPlan): Boolean =
    left.output.exists(_.name == LeftCell)
}

/** spark.sql.extensions entry point for spark-submit deployments. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PipJoinRewrite)
  }
}
