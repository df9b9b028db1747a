package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: plan a distance-radius join as a grid-bucketed
  * equi-join instead of a cartesian product.
  *
  * A user writing the natural form
  * {{{ a.join(b, sqrt(pow2(a.x - b.x) + pow2(a.y - b.y)) <= lit(r)) }}}
  * gets a CartesianProduct/BroadcastNestedLoopJoin from Spark — the
  * O(|a| x |b|) plan the reference's buffered POI search exists to avoid
  * (ram-analysis/app/calculate-eta/utils.js:47). This rule recognizes the
  * planar-distance predicate, buckets both sides into cells of edge r,
  * replicates the RIGHT side to its 3x3 cell neighborhood (explode of 9
  * offsets), and joins on the cell key with the original predicate kept
  * as a post-condition — the same plan [[graft.operators.GeoJoins
  * .radiusJoin]] builds by hand, derived automatically. Any pair within
  * distance r shares a neighborhood cell, so results are identical.
  *
  * Fires only on Inner/Cross joins whose condition is exactly the bare
  * radius predicate (an equi-join alongside it already avoids the
  * cartesian plan); the rewritten join's condition is a conjunction, so
  * the rule cannot re-match its own output.
  */
object RadiusJoinRewrite extends Rule[LogicalPlan] {

  /** sqrt((a1 - b1)*(a1 - b1) + (a2 - b2)*(a2 - b2)) with the two
    * factors of each square semantically equal. Returns the four legs. */
  private object PlanarDist {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression)] =
      e match {
        case Sqrt(Add(
          Multiply(Subtract(a1, b1, _), Subtract(a1b, b1b, _), _),
          Multiply(Subtract(a2, b2, _), Subtract(a2b, b2b, _), _), _))
          if a1.semanticEquals(a1b) && b1.semanticEquals(b1b) &&
            a2.semanticEquals(a2b) && b2.semanticEquals(b2b) =>
          Some((a1, b1, a2, b2))
        case _ => None
      }
  }

  private def radiusOf(e: Expression): Option[Double] = e match {
    case Literal(d: Double, _) if d > 0 => Some(d)
    case Literal(i: Int, _) if i > 0 => Some(i.toDouble)
    case Literal(l: Long, _) if l > 0 => Some(l.toDouble)
    case _ => None
  }

  private def cell(v: Expression, r: Double): Expression =
    Floor(Divide(v, Literal(r)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross,
        Some(cond @ LessThanOrEqual(PlanarDist(a1, b1, a2, b2), rLit)), hint)
        if radiusOf(rLit).isDefined =>
      val r = radiusOf(rLit).get
      // each dimension must compare one left-side leg with one right-side leg
      def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
        if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
        else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
        else None
      val legs = Seq(a1, b1, a2, b2).map(sideOf)
      val splitOk = legs.forall(_.isDefined) &&
        legs(0) != legs(1) && legs(2) != legs(3)
      if (!splitOk) j
      else {
        // each dimension orients independently — (a-b) and (b-a) legs may
        // list sides in opposite order between the two dimensions
        val (l1, r1) = if (legs(0).contains(true)) (a1, b1) else (b1, a1)
        val (l2, r2) = if (legs(2).contains(true)) (a2, b2) else (b2, a2)
        val lc1 = Alias(cell(l1, r), "_g_lc1")()
        val lc2 = Alias(cell(l2, r), "_g_lc2")()
        val newLeft = Project(left.output :+ lc1 :+ lc2, left)
        // replicate right rows to the 3x3 neighborhood: two explodes
        val offsets = CreateArray(Seq(Literal(-1L), Literal(0L), Literal(1L)))
        val dx = AttributeReference("_g_dx", LongType, nullable = false)()
        val dy = AttributeReference("_g_dy", LongType, nullable = false)()
        val genX = Generate(Explode(offsets), Nil, outer = false, None, Seq(dx), right)
        val genY = Generate(Explode(offsets), Nil, outer = false, None, Seq(dy), genX)
        val rc1 = Alias(Add(cell(r1, r), dx), "_g_rc1")()
        val rc2 = Alias(Add(cell(r2, r), dy), "_g_rc2")()
        val newRight = Project(right.output :+ rc1 :+ rc2, genY)
        val newCond = And(And(
          EqualTo(lc1.toAttribute, rc1.toAttribute),
          EqualTo(lc2.toAttribute, rc2.toAttribute)), cond)
        val rejoined = Join(newLeft, newRight, Inner, Some(newCond), hint)
        Project(left.output ++ right.output, rejoined)
      }
  }
}
