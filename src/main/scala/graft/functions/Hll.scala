package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared HyperLogLog building blocks (m=1024 registers, md5-portable
  * hash family — the same engine-neutral device as the minhash/simhash
  * oracles): the (group, bucket, rho) projection and the register→
  * estimate fold are used by BOTH the batch sketch (q81) and the
  * streaming register maintenance (q109), so both derive from the same
  * hash algebra the DuckDB oracles re-implement in SQL. Everything
  * before the single output division is exact integer arithmetic (max /
  * shifted sums), which is what makes the register state perfectly
  * re-aggregatable: max is associative, commutative and idempotent, so
  * shards, retries, micro-batches and AQE re-plans all converge to the
  * identical register table. */
object Hll {
  val M = 1024L
  /** alpha_m · m² · 2^53 — one double literal shared with the SQL
    * oracles, so the estimate is bit-identical in any engine. */
  val Scale: Double = 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 * 9007199254740992.0
  /** 2^53: the s-fold weight of an untouched register (rho = 0). */
  val EmptyRegisterWeight = 9007199254740992L

  /** (group, bucket, rho) projection of a key column: bucket = first 12
    * md5 bits mod m, rho = leading-zero rank of the next 52 bits. */
  def rhoFrame(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.select(col(groupCol), md5(col(keyCol).cast("string")).as("h"))
      .select(col(groupCol),
        (conv(substring(col("h"), 1, 3), 16, 10).cast("long") % M).as("bucket"),
        conv(substring(col("h"), 4, 13), 16, 10).cast("long").as("w"))
      .select(col(groupCol), col("bucket"),
        when(col("w") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("w"))).cast("long")).as("rho"))

  /** Fold a register table (group, bucket, r) into the harmonic-mean
    * estimate: (group, n_used, s_total, est). */
  def estimate(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(groupCol).agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")).as("s_used"),
        count(lit(1)).as("n_used"))
      .select(col(groupCol), col("n_used"),
        (col("s_used") + (lit(M) - col("n_used")) * lit(EmptyRegisterWeight)).as("s_total"))
      .withColumn("est", lit(Scale) / col("s_total").cast("double"))
}
