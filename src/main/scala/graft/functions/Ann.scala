package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.Synthetic.{mix, mix2, u01}

/** Approximate-nearest-neighbour search over an embedding column
  * (Array[Float]) — brute-force cosine top-k as the exact baseline and a
  * random-hyperplane LSH bucketing as the scale path (candidates shrink
  * from O(N) to a bucket + multi-probe neighbourhood; the index is just a
  * groupable int column, so it shuffles/partitions like any key).
  */
object Ann {

  /** fp64 dot product of two float arrays as a Column expression. */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normD(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))

  /** Deterministic pseudo-gaussian hyperplanes: plane i, dim j from
    * splitmix64 (sum of two uniforms, symmetric around 0 — sign-LSH only
    * needs symmetry, not true gaussianity). */
  def hyperplane(plane: Int, dim: Int, seed: Long = 42L): Double = {
    val h = mix2(seed ^ 0xa11, (plane.toLong << 32) | dim.toLong)
    (u01(h) + u01(mix(h))) - 1.0
  }

  /** Sign-LSH bucket id from `nPlanes` hyperplanes (one bit each). */
  def lshBucket(embedding: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    val bits = (0 until nPlanes).map { p =>
      val dot = (0 until dim).map(j => embedding(j).cast("double") * lit(hyperplane(p, j, seed)))
        .reduce(_ + _)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _).as("bucket")
  }

  /** Exact brute-force top-k cosine neighbours for a query subset. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val joined = q.crossJoin(broadcast(
        emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Multi-table LSH ANN: `nTables` independent sign-LSH tables of
    * `nPlanes` bits each (candidates = union of same-bucket rows across
    * tables, optionally plus all 1-bit probes of each bucket), exact
    * cosine rank within candidates. Returns top-k per query
    * (approximate: recall < 1 by construction, raised by nTables).
    *
    * Scale shape: per-table buckets hold ~N/2^nPlanes rows, so nPlanes
    * must grow with log2(N) to keep candidate sets bounded — at 10^9
    * vectors, nPlanes=16 gives ~15k candidates per probe — while
    * nTables (and 1-bit probes) buy back recall independently of
    * bucket size. The candidate generator is a plain (bucket) equi-join
    * on an int-like key: partitionable, AQE-skew-handleable, never an
    * all-pairs product. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, dim: Int,
              nPlanes: Int = 12, nTables: Int = 4, probe1Bit: Boolean = true,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.pipeline.Exprs.{col => ec, expr => ee}
    val withBuckets = emb.withColumn("buckets",
      ec(SignLshBuckets(ee(col("embedding")), dim, nPlanes, nTables, seed)))
    val flat = withBuckets.select(col("vec_id"), col("embedding"),
      explode(col("buckets")).as("bucket"))
    val qBase = flat.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    // multi-probe: within each table, also probe the 1-bit flips of the
    // bucket's nPlanes low bits (the table tag lives in the high bits and
    // is preserved, so probes never cross tables)
    val q =
      if (probe1Bit)
        qBase.select(col("query_id"), col("qe"),
          explode(array((lit(0L) +: (0 until nPlanes).map(b => lit(1L << b)))
            .map(f => col("bucket").bitwiseXOR(f)): _*)).as("bucket"))
      else qBase
    val cand = q.join(flat.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), col("bucket")), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("cos"))
      // a pair can collide in several tables/probes; cos is identical
      .groupBy("query_id", "neighbor_id").agg(min("cos").as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}

/** Sign-LSH bucket ids for nTables independent tables (nPlanes sign bits
  * each) as one native expression — the equivalent Column tree would be
  * nTables * nPlanes * dim terms (tens of thousands of nodes for
  * realistic parameters, far past codegen limits). Bucket ids are
  * disjoint across tables: table index in bits 32+. */
case class SignLshBuckets(child: org.apache.spark.sql.catalyst.expressions.Expression,
                          dim: Int, nPlanes: Int, nTables: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  require(nPlanes >= 1 && nPlanes <= 30, s"nPlanes $nPlanes out of range")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nTables * nPlanes)(p => Array.tabulate(dim)(j => Ann.hyperplane(p, j, seed)))
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"embedding type $other unsupported")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val e = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      e(j) = if (elemIsFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val pl = planes(t * nPlanes + p)
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += e(i) * pl(i); i += 1 }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = (t.toLong << 32) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): SignLshBuckets = copy(child = c)
}
