package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

import graft.pipeline.Exprs

/** Bloom-filter membership pre-filtering for set-intersection joins whose
  * probe side is corpus-sized and whose build side is small-but-not-tiny
  * (benchmark decontamination, blocklist scrubbing, id-set pruning).
  *
  * Why not just broadcast the build side? A bloom filter at 1% fpp costs
  * ~1.2 bytes/key versus 8+ bytes for the exact key set plus hash-table
  * overhead, so the filter stays broadcastable long after the exact set
  * stops being; and the probe is a branch-free double-hash check that
  * drops ~99% of the corpus rows MAP-SIDE, before any exchange. Because a
  * bloom filter has no false negatives, following the pre-filter with an
  * exact confirm join on the survivors (now a tiny fraction of the
  * corpus) gives results IDENTICAL to the plain join — the filter changes
  * the plan, never the answer (the q53/q45 oracle-equality pins this).
  * Spark's own AQE runtime filtering (InjectRuntimeFilter) applies the
  * same construction automatically for equi-joins it can see through;
  * this expression makes the technique available explicitly, e.g. when
  * the build side is assembled outside the query.
  */
object Bloom {

  /** Distributed build (treeAggregate under the hood) of a bloom filter
    * over a long-typed column. The count() sizes the filter exactly; the
    * build side is benchmark-sized by contract (MBs at 100 TB corpus
    * scale), so the extra pass is cheap and keeps fpp honest. */
  def filterOf(df: DataFrame, colName: String, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(colName, math.max(df.count(), 1L), fpp)

  def mightContain(c: Column, bf: BloomFilter): Column =
    Exprs.col(BloomMightContain(Exprs.expr(c), bf))
}

/** `bf.mightContainLong(child)` as a native expression: full whole-stage
  * codegen (the probe inlines into the scan's generated loop), the filter
  * shipped once per executor via the plan's reference array. */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT key, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bf, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
