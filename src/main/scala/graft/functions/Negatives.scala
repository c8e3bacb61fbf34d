package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Frequency-weighted systematic negative sampling (the word2vec-style
  * f^(3/4) negative-sampling distribution, Mikolov et al. 2013 —
  * public): for each anchor row, pick k vocabulary items proportional
  * to their smoothed frequency, deterministically.
  *
  * Scale shape: the weight dictionary is DICTIONARY-sized (like the IVF
  * centroids / PQ codebooks, it rides the task binary as a broadcast
  * array), anchors are the data-sized side, and resolution is a per-row
  * binary search over the cumulative-weight array — map-only, no range
  * join, no shuffle. The per-anchor picks are the k systematic cuts
  * (offset + ⌊j·T/k⌋) mod T with the offset derived from
  * md5(anchor id) — the engine-portable hash family every oracle
  * re-implements — so the sample is reproducible under any partitioning
  * and re-run, and anchors spread their negatives across the whole
  * weight line instead of clustering.
  *
  * All arithmetic is exact: integer cuts, and the f^(3/4) smoothing is
  * floor(sqrt(floor(sqrt(f³)))) — sqrt is CORRECTLY ROUNDED under IEEE
  * 754 (unlike pow/ln), so Spark and any SQL engine agree bit-for-bit.
  */
case class SampleNegatives(child: Expression, cum: Array[Long], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  require(k >= 1 && cum.nonEmpty && cum.last > 0, "need k >= 1 and positive total weight")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** smallest index with cum(idx) > p  (cum is the inclusive running
    * total, so item idx covers [cum(idx) - w(idx), cum(idx))). */
  private def upperBound(p: Long): Int = {
    var lo = 0; var hi = cum.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cum(mid) > p) hi = mid else lo = mid + 1
    }
    lo
  }

  override def nullSafeEval(v: Any): Any = {
    val anchor = v.asInstanceOf[Long]
    val t = cum.last
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(anchor.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // first 12 hex chars = first 6 bytes, big-endian (matches
    // conv(substring(md5(x), 1, 12), 16, 10) and DuckDB '0x' || substr)
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    val o = h % t
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val p = (o + (j.toLong * t) / k) % t
      out(j) = upperBound(p)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SampleNegatives = copy(child = c)
}
