package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN — a whole-operator extension (brief preference tier (c):
  * custom `LogicalPlan` + `Rule[LogicalPlan]` + `SparkStrategy` +
  * `SparkPlan`, registered via `SparkSessionExtensions`): for each
  * left row, attach the LATEST right row of the same `by` key whose
  * `on` value is ≤ the left row's (backward as-of, the pandas
  * `merge_asof` / DuckDB `ASOF JOIN` default). Spark's built-in
  * operators can't express this as one operator — the compositional
  * forms are a union+window trick or an inequality join that explodes
  * to per-pair work — so it earns the full custom-plan treatment.
  *
  * Scale shape: both sides hash-partitioned on `by` (the same
  * one-shuffle-each layout as a sort-merge equi-join), sorted within
  * partitions by (by, on), then a single streaming merge pass per
  * partition holding O(1) state (the current best match) — no
  * pair explosion, no per-key buffering, 100 TB-safe.
  */
final case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression) extends BinaryNode {

  // right side is outer: unmatched left rows pad with nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Left-only deterministic predicates commute with the as-of join
  * (every left row produces exactly one output row regardless of the
  * others), so they are pushed below it — at scale this turns a
  * post-join filter into a pruned scan. Right-side predicates must NOT
  * move: dropping a right row can change which row is "latest".
  */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoin) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(leftOnly.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through the as-of join: a custom logical node is
  * opaque to Catalyst's built-in `ColumnPruning`, so a narrow Project
  * above a wide as-of join would otherwise scan every column of both
  * inputs. Columns the projection doesn't reference (and that aren't
  * the join's own on/by keys) are pruned into each child, which lets
  * the standard rules carry the pruning all the way into the scans.
  */
object PruneAsofJoinColumns extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, aj: AsofJoin) =>
      val required = p.references ++ aj.leftOn.references ++
        aj.rightOn.references ++ aj.leftBy.references ++ aj.rightBy.references
      val leftNeeded = aj.left.output.filter(required.contains)
      val rightNeeded = aj.right.output.filter(required.contains)
      if (leftNeeded.length == aj.left.output.length &&
          rightNeeded.length == aj.right.output.length) p
      else p.copy(child = aj.copy(
        left = Project(leftNeeded, aj.left),
        right = Project(rightNeeded, aj.right)))
  }
}

/** Plans the logical [[AsofJoin]] as [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lo, ro, lb, rb) =>
      AsofJoinExec(lo, ro, lb, rb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: requires both children clustered on
  * `by` (EnsureRequirements inserts the co-partitioning exchanges,
  * exactly as for a shuffled equi-join) and sorted by (by, on), then
  * merges the two sorted streams per partition. Rows with a null `by`
  * or `on` never match (SQL join-key semantics). Not codegen'd — the
  * merge is a single tight iterator, and the surrounding stages keep
  * their own whole-stage spans.
  */
final case class AsofJoinExec(
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    val (lOn, rOn, lBy, rBy) = (leftOn, rightOn, leftBy, rightBy)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lByE = BindReferences.bindReference(lBy, leftOutput)
      val lOnE = BindReferences.bindReference(lOn, leftOutput)
      val rByE = BindReferences.bindReference(rBy, rightOutput)
      val rOnE = BindReferences.bindReference(rOn, rightOutput)
      val byOrd = TypeUtils.getInterpretedOrdering(lBy.dataType)
      val onOrd = TypeUtils.getInterpretedOrdering(lOn.dataType)
      val nullRight = new GenericInternalRow(rightOutput.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOutput, allOutput)

      // rHead: the next not-yet-admitted right row (rows are reused by
      // the child iterator, but rHead is only ever compared, never
      // retained across next() — `matched` is the one copied buffer)
      var rHead: InternalRow = null
      var matched: InternalRow = null
      var matchedBy: Any = null

      // admit right rows while they are at or before (lb, lo) in the
      // (by, on) merge order; the last admitted row of key lb is the
      // as-of match (right is sorted, so later admits are later `on`s)
      def advance(lb: Any, lo: Any): Unit = {
        var go = true
        while (go) {
          if (rHead == null) rHead = if (rIter.hasNext) rIter.next() else null
          if (rHead == null) go = false
          else {
            val rb = rByE.eval(rHead)
            if (rb == null) rHead = null // null key never matches; discard
            else {
              val c = byOrd.compare(rb.asInstanceOf[AnyRef], lb.asInstanceOf[AnyRef])
              if (c < 0) rHead = null // left is sorted too: never needed again
              else if (c > 0) go = false // right is ahead; stop
              else {
                val ro = rOnE.eval(rHead)
                if (ro == null) rHead = null // null on never matches
                else if (onOrd.lteq(ro.asInstanceOf[AnyRef], lo.asInstanceOf[AnyRef])) {
                  matched = rHead.copy()
                  // re-evaluate from the copy: an eval against the
                  // iterator's reused row may point into its buffer
                  matchedBy = rByE.eval(matched)
                  rHead = null
                } else go = false // future-dated for this left row; stop
              }
            }
          }
        }
      }

      lIter.map { l =>
        val lb = lByE.eval(l)
        val lo = lOnE.eval(l)
        val r =
          if (lb == null || lo == null) nullRight
          else {
            advance(lb, lo)
            if (matched != null &&
                byOrd.compare(matchedBy.asInstanceOf[AnyRef], lb.asInstanceOf[AnyRef]) == 0)
              matched
            else nullRight
          }
        resultProj(joined(l, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
