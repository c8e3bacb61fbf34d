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

  /** LSH-bucketed ANN: candidates share the query's bucket or any 1-bit
    * probe of it; exact cosine rank within candidates. Returns top-k per
    * query (approximate: recall < 1 by construction). */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, dim: Int,
              nPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBucket = emb.withColumn("bucket", lshBucket(col("embedding"), dim, nPlanes, seed))
    // multi-probe: the bucket plus all 1-bit flips
    val probes = array((lit(-1) +: (0 until nPlanes).map(b => lit(b))): _*)
    val q = withBucket.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket").as("qb"))
      .withColumn("probe_bit", explode(probes))
      .withColumn("probe_bucket",
        when(col("probe_bit") === -1, col("qb"))
          .otherwise(col("qb").bitwiseXOR(expr("shiftleft(1, probe_bit)"))))
    val cand = q.join(withBucket.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), col("bucket").as("probe_bucket")),
        Seq("probe_bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qe", "neighbor_id", "ne").distinct()
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
