package graft.plans

import graft.sources.n5.N5Table
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Rewrites element-view range predicates into block-grid predicates
  * (SURVEY §4 "custom Catalyst work" item 2; reference semantics: Dask
  * slicing pulls only intersecting zarr chunks, `n5_to_tif.py:26`).
  *
  * `N5.elements` tags its x/y/z columns with axis metadata. When a Filter
  * bounds those columns with foldable integral limits, this rule derives
  * the surviving grid range per axis (block g on axis a covers coordinates
  * `[g*bs(a), g*bs(a)+bs(a))`) and injects a `Filter(gx/gy/gz ...)`
  * directly above the N5 DSv2 relation. The connector's filter pushdown
  * then prunes block FILES before any I/O — so an ad-hoc
  * `elements(read(...)).where($"x" < 40)` touches only intersecting
  * chunks, with no manual `readBox` call. The original fine-grained filter
  * is left in place (the coarse block filter keeps whole blocks; edge
  * trimming still happens element-wise above the Generate).
  *
  * Soundness limits (conservative by construction): only top-level
  * conjuncts, only `axis cmp literal` shapes, only when the subtree under
  * the Filter contains exactly one N5 relation, and only when that
  * relation is reached through pushdown-safe unary operators
  * (Project/Filter/Generate/SubqueryAlias). The path restriction is what
  * makes the rewrite sound: an order-sensitive operator between the
  * filter and the scan (Window, Sort+Limit, Aggregate, Join) would
  * observe different input under pruning, and it also guarantees the
  * tagged coordinate column actually descends from this relation (a
  * tagged column smuggled in from elsewhere implies a Join/Union on the
  * path, which bails). Anything not matching is left untouched, never
  * mis-pruned.
  */
case class N5BoxPruning(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import N5BoxPruning._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, child) =>
      val bounds = axisBounds(splitConjunctivePredicates(cond))
      if (bounds.isEmpty) f
      else {
        child.collect {
          case r: DataSourceV2Relation if r.table.isInstanceOf[N5Table] => r
        } match {
          case Seq(rel) =>
            (gridCondition(rel, bounds), pathConjuncts(child, rel)) match {
              case (Some(gc), Some(existing))
                  if !splitConjunctivePredicates(gc)
                    .forall(p => existing.exists(_.semanticEquals(p))) =>
                Filter(cond, inject(child, rel, gc))
              case _ => f
            }
          case _ => f
        }
      }
  }

  /** Conjuncts of every Filter on the path from `p` down to `rel`, or None
    * when the path crosses anything other than pushdown-safe unary
    * operators. A None both blocks unsound pruning (order-sensitive
    * operators, foreign tagged columns via Join/Union) and the returned
    * conjuncts are the dedup set that keeps re-analysis from stacking
    * duplicate grid filters.
    */
  private def pathConjuncts(
      p: LogicalPlan, rel: DataSourceV2Relation): Option[Seq[Expression]] =
    p match {
      case r: DataSourceV2Relation =>
        if (r eq rel) Some(Nil) else None
      case Filter(c, child) =>
        pathConjuncts(child, rel).map(splitConjunctivePredicates(c) ++ _)
      case pr: Project => pathConjuncts(pr.child, rel)
      case g: Generate => pathConjuncts(g.child, rel)
      case s: SubqueryAlias => pathConjuncts(s.child, rel)
      case _ => None
    }

  /** Per-axis inclusive [lo, hi] bounds from `axis cmp literal` conjuncts. */
  private def axisBounds(conjuncts: Seq[Expression]): Map[Int, (Option[Long], Option[Long])] = {
    var m = Map.empty[Int, (Option[Long], Option[Long])]
    def tighten(axis: Int, lo: Option[Long], hi: Option[Long]): Unit = {
      val (l0, h0) = m.getOrElse(axis, (None, None))
      m += axis -> (
        Seq(l0, lo).flatten.reduceOption(_ max _),
        Seq(h0, hi).flatten.reduceOption(_ min _))
    }
    conjuncts.foreach {
      case GreaterThanOrEqual(Axis(a), Lit(v)) => tighten(a, Some(v), None)
      case GreaterThan(Axis(a), Lit(v)) => tighten(a, Some(v + 1), None)
      case LessThanOrEqual(Axis(a), Lit(v)) => tighten(a, None, Some(v))
      case LessThan(Axis(a), Lit(v)) => tighten(a, None, Some(v - 1))
      case EqualTo(Axis(a), Lit(v)) => tighten(a, Some(v), Some(v))
      // mirrored literal-first forms
      case GreaterThanOrEqual(Lit(v), Axis(a)) => tighten(a, None, Some(v))
      case GreaterThan(Lit(v), Axis(a)) => tighten(a, None, Some(v - 1))
      case LessThanOrEqual(Lit(v), Axis(a)) => tighten(a, Some(v), None)
      case LessThan(Lit(v), Axis(a)) => tighten(a, Some(v + 1), None)
      case EqualTo(Lit(v), Axis(a)) => tighten(a, Some(v), Some(v))
      case _ => ()
    }
    m
  }

  /** Build the gx/gy/gz conjunction for the relation, or None when block
    * geometry is unavailable or no bound survives.
    */
  private def gridCondition(
      rel: DataSourceV2Relation,
      bounds: Map[Int, (Option[Long], Option[Long])]): Option[Expression] = {
    val table = rel.table.asInstanceOf[N5Table]
    table.readAttributes.flatMap { attrs =>
      val gridNames = Array("gx", "gy", "gz")
      val preds = bounds.toSeq.sortBy(_._1).flatMap { case (axis, (lo, hi)) =>
        if (axis < 0 || axis >= attrs.ndim || axis >= gridNames.length) Nil
        else rel.output.find(_.name == gridNames(axis)).toSeq.flatMap { g =>
          val bs = attrs.blockSize(axis).toLong
          val loPred = lo.map(l =>
            GreaterThanOrEqual(g, Literal(clampInt(Math.floorDiv(l, bs)))))
          val hiPred = hi.map(h =>
            LessThanOrEqual(g, Literal(clampInt(Math.floorDiv(h, bs)))))
          loPred.toSeq ++ hiPred.toSeq
        }
      }
      preds.reduceOption(And)
    }
  }

  private def clampInt(v: Long): Int =
    math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, v)).toInt

  private def inject(
      plan: LogicalPlan, rel: DataSourceV2Relation, gc: Expression): LogicalPlan =
    plan.transformUp {
      case r: DataSourceV2Relation if r eq rel => Filter(gc, r)
    }
}

object N5BoxPruning {
  /** Column-metadata key `N5.elements` uses to tag coordinate columns. */
  val AxisKey = "graft.n5.axis"

  /** Matches an attribute tagged as an element-view coordinate axis. */
  private object Axis {
    def unapply(e: Expression): Option[Int] = e match {
      case a: AttributeReference if a.metadata.contains(AxisKey) =>
        Some(a.metadata.getLong(AxisKey).toInt)
      case _ => None
    }
  }

  /** Evaluates a foldable integral expression (handles the casts the
    * analyzer wraps around bare literals).
    */
  private object Lit {
    def unapply(e: Expression): Option[Long] =
      if (!e.foldable) None
      else e.dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          e.eval() match {
            case l: java.lang.Long => Some(l)
            case i: java.lang.Integer => Some(i.toLong)
            case s: java.lang.Short => Some(s.toLong)
            case b: java.lang.Byte => Some(b.toLong)
            case _ => None
          }
        case _ => None
      }
  }
}
