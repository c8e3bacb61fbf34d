package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

import graft.pipeline.Exprs

/** Count-min-sketch frequency pre-filtering for exact heavy-hitter
  * queries whose key space is corpus-sized (frequent n-grams, boilerplate
  * phrases, hot URLs/domains).
  *
  * The naive plan — `GROUP BY key HAVING count >= T` — shuffles EVERY
  * distinct key to build the exact counts and only then discards the
  * long tail, which at 100 TB means an exchange carrying billions of
  * singleton n-grams that were never going to qualify. A count-min
  * sketch is a tiny (KBs–MBs, independent of cardinality) mergeable
  * summary whose estimates NEVER UNDERCOUNT, so
  *
  *  1. one map-only pass builds per-partition sketches that merge to a
  *     driver-side global sketch (`df.stat.countMinSketch`, a
  *     treeAggregate — no shuffle);
  *  2. a second pass keeps only keys whose sketch estimate reaches the
  *     threshold — a branch-free probe inlined into the scan loop,
  *     dropping the tail MAP-SIDE before any exchange;
  *  3. the exact `GROUP BY ... HAVING` runs on the survivors only.
  *
  * Because overestimates are the only sketch error mode, step 2 has no
  * false negatives and step 3 re-checks the exact count, so the result
  * is IDENTICAL to the naive plan (the q61 oracle pins this); the sketch
  * changes the plan, never the answer — the same prefilter-then-confirm
  * construction as [[Bloom]], with frequency thresholds instead of set
  * membership.
  */
object Cms {

  /** Distributed build over a long-typed key column. eps bounds the
    * overestimate at eps*N (N = total stream length) with the given
    * confidence; the seed makes the hash family — and therefore the
    * whole plan — deterministic. */
  def sketchOf(df: DataFrame, colName: String, eps: Double = 1e-4,
               confidence: Double = 0.999, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)

  def estimate(c: Column, cms: CountMinSketch): Column =
    Exprs.col(CmsEstimate(Exprs.expr(c), cms))
}

/** `cms.estimateCount(child)` as a native expression: whole-stage codegen
  * (the probe inlines into the generated scan loop), the sketch shipped
  * once per executor via the plan's reference array. */
case class CmsEstimate(child: Expression, cms: CountMinSketch)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT key, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override protected def nullSafeEval(input: Any): Any =
    cms.estimateCount(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", cms, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount((Object) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
