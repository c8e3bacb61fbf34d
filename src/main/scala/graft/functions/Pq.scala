package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compressed-vector scale path for
  * similarity search, composing with the IVF coarse quantizer into the
  * classic IVF-PQ shape (coarse list prune → asymmetric-distance rerank
  * over 1-byte-per-subspace codes instead of full vectors).
  *
  * Why it matters at 100 TB: the exact rerank inside IVF candidates
  * (q28) still reads the full fp32 vectors of every candidate — at
  * 10^12 × 64 dims that is the dominant IO. PQ codes compress each
  * vector to M small ints (here 8), so the candidate join carries ~16
  * bytes instead of 256 and the query-side lookup tables (M×K longs)
  * ride the row like any other small column. Scoring is an exact
  * integer sum over fixed-point table entries — associative, order-free,
  * bit-stable under any partitioning or AQE re-plan (the q79/q84/q95
  * quantize-before-the-cross-row-sum pattern).
  *
  * Everything is deterministic: codebooks train driver-locally on a
  * bounded hash-ordered sample (same device as
  * [[Ann.trainIvfCentroids]]), assignment ties break to the smaller
  * code, and the ADC fixed-point floor happens per (query, m, code)
  * BEFORE any cross-row arithmetic.
  */
object Pq {

  /** Train M per-subspace codebooks of K centroids each with plain-L2
    * Lloyd's iterations on a bounded deterministic sample (hash-ordered
    * limit with vec_id tiebreak — unbiased w.r.t. id order, identical
    * every run). Returns codebooks(m)(k)(j) with j < dim/M doubles.
    * The codebook is M×K×(dim/M) doubles — tiny by construction (the
    * standard PQ regime: K=16..256), so it rides the task binary like
    * the IVF centroid matrix. */
  def trainCodebooks(emb: DataFrame, dim: Int, m: Int, k: Int,
                     iters: Int = 8, maxTrain: Int = 4096): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val sample = emb.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(maxTrain)
      .collect().map { r =>
        val s = r.getSeq[Any](1)
        Array.tabulate(dim)(i => s(i).asInstanceOf[Number].doubleValue())
      }
    require(sample.length >= k, s"need >= $k training vectors, got ${sample.length}")
    Array.tabulate(m) { mi =>
      val xs = sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      var cents = xs.take(k).map(_.clone())
      (0 until iters).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        xs.foreach { x =>
          val c = nearestCode(x, cents)
          var j = 0
          while (j < sub) { sums(c)(j) += x(j); j += 1 }
          counts(c) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c) // empty cluster keeps its centroid
          else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
  }

  /** argmin_k ||x − c_k||², computed as cc − 2·x·c (the x·x term is
    * constant per row) with both dot products folded in ascending-j
    * order — the EXACT float expression the SQL oracle mirrors
    * (list_dot_product ≡ ascending fold, proven by q16/q66). Ties break
    * to the smaller code. */
  private[functions] def nearestCode(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val d = adcDist(x, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** cc − 2·x·c, ascending-j folds. */
  private[functions] def adcDist(x: Array[Double], cent: Array[Double]): Double = {
    var cc = 0.0
    var xc = 0.0
    var j = 0
    while (j < cent.length) { cc += cent(j) * cent(j); xc += x(j) * cent(j); j += 1 }
    cc - 2.0 * xc
  }

  /** 2^20 fixed-point scale for ADC table entries: per-(query, m, code)
    * distances quantize to longs BEFORE the per-candidate sum, so the
    * cross-row accumulation is exact integer arithmetic. */
  val AdcScale = 1048576.0

  /** IVF-PQ top-k: coarse-quantizer candidate pruning (nProbe inverted
    * lists, [[IvfLists]]) + asymmetric-distance rerank over PQ codes.
    * The candidate generator stays a plain list-id equi-join; the rerank
    * is a codegen'd higher-order-function fold over (codes ⨯ query
    * table) — full vectors never reach the join. Returns
    * (query_id, rank, neighbor_id, adc) with adc the exact fixed-point
    * integer distance (ascending = nearer) and neighbor_id tiebreak. */
  def ivfPqTopK(emb: DataFrame, queryPred: Column, k: Int,
                cents: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
                nProbe: Int): DataFrame = {
    import graft.pipeline.Exprs.{col => ec, expr => ee}
    import org.apache.spark.sql.expressions.Window
    val assigned = emb.select(col("vec_id").as("neighbor_id"),
      ec(PqCodes(ee(col("embedding")), codebooks)).as("codes"),
      explode(ec(IvfLists(ee(col("embedding")), cents, 1))).as("list"))
    val q = emb.where(queryPred).select(col("vec_id").as("query_id"),
      ec(PqAdcTable(ee(col("embedding")), codebooks)).as("qtab"),
      explode(ec(IvfLists(ee(col("embedding")), cents, nProbe))).as("list"))
    // every vector lives in exactly ONE list (nProbe=1 on the assign
    // side) and a query's probed lists are distinct, so the equi-join
    // yields each (query, neighbor) pair at most once — no dedup needed
    val scored = q.join(assigned, Seq("list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(codes, qtab, (c, t) -> element_at(t, c + 1)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)").as("adc"))
    val w = Window.partitionBy("query_id").orderBy(col("adc").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc")
  }
}

/** PQ code assignment as a native expression: code(m) =
  * argmin_k (cc − 2·x_m·c_{m,k}) with ascending-j dot folds and
  * smaller-code tiebreak. The Column-tree equivalent would be M×K×subdim
  * terms; here it is one CodegenFallback eval whose cost is the M×K
  * small dot products. */
case class PqCodes(child: org.apache.spark.sql.catalyst.expressions.Expression,
                   codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val sub = codebooks(0)(0).length
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"embedding type $other unsupported")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Any](codebooks.length)
    val x = new Array[Double](sub)
    var m = 0
    while (m < codebooks.length) {
      var j = 0
      while (j < sub) {
        val i = m * sub + j
        x(j) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        j += 1
      }
      out(m) = Pq.nearestCode(x, codebooks(m))
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): PqCodes = copy(child = c)
}

/** The query-side ADC lookup table as a native expression:
  * table(m)(k) = floor((cc − 2·q_m·c_{m,k}) · 2^20) as long — the
  * fixed-point quantization happens HERE, per (query, m, code), so the
  * downstream per-candidate sum is exact integer math. */
case class PqAdcTable(child: org.apache.spark.sql.catalyst.expressions.Expression,
                      codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  @transient private lazy val sub = codebooks(0)(0).length
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"embedding type $other unsupported")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val x = new Array[Double](sub)
    val out = new Array[Any](codebooks.length)
    var m = 0
    while (m < codebooks.length) {
      var j = 0
      while (j < sub) {
        val i = m * sub + j
        x(j) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        j += 1
      }
      val row = new Array[Any](codebooks(m).length)
      var k = 0
      while (k < codebooks(m).length) {
        row(k) = math.floor(Pq.adcDist(x, codebooks(m)(k)) * Pq.AdcScale).toLong
        k += 1
      }
      out(m) = new GenericArrayData(row)
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): PqAdcTable = copy(child = c)
}
