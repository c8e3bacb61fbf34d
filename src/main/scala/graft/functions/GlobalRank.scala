package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row_number over a string sort key — the sorted-neighborhood
  * primitive (Hernández & Stolfo's merge/purge blocking) — without the
  * SinglePartition window Spark would plan for `row_number().over(
  * Window.orderBy(...))` with no partition spec.
  *
  * Same two-pass scan shape as [[PrefixSum]], generalized to string keys:
  *
  *  1. bucket every row by an ORDER-PRESERVING long prefix of the key
  *     (big-endian first 8 bytes, NUL-padded): k1 <= k2 implies
  *     prefix(k1) <= prefix(k2), and ties on the truncated prefix land in
  *     the same bucket, so bucket boundaries never split the total order;
  *  2. per-bucket local row_number (window partitioned by bucket — one
  *     shuffle on the bucket id, each task sorts ~N/P rows);
  *  3. per-bucket row counts (P longs on the driver, a parallelism knob,
  *     never data-sized) become exclusive offsets added back map-side.
  *
  * Ties on the FULL key are broken by `tieCol` (must be unique — a
  * primary key), making the rank deterministic end to end. Skew: buckets
  * are equal-width over the observed prefix range; heavily duplicated key
  * prefixes (all rows share 8 leading bytes) collapse to one bucket —
  * callers with such keys should pre-hash a wider discriminating prefix
  * into the key. For dictionary-word keys (names, normalized titles) the
  * first bytes discriminate well.
  */
object GlobalRank {

  /** Appends `outCol` = 1-based global row number ordered by
    * (`keyCol` asc, `tieCol` asc). `tieCol` must be long-castable and
    * unique within equal keys. */
  def byStringKey(df: DataFrame, keyCol: String, tieCol: String,
                  outCol: String, buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // order-preserving 8-byte big-endian prefix; unhex of a fixed-width
    // hex slice keeps it exact integer arithmetic (no float)
    val prefix = {
      val padded = rpad(col(keyCol), 8, "\u0000")
      // conv() on the 16-hex-digit prefix would overflow signed long for
      // bytes >= 0x80 in the first position; ASCII sort keys stay < 0x80
      // so the value is non-negative and order-preserving. Non-ASCII
      // leading bytes would need an unsigned shift — assert instead.
      conv(hex(substring(padded, 1, 8)), 16, 10).cast("long")
    }
    // the prefixed frame feeds THREE passes (the min/max agg, the
    // bucket counts, the final local rank) — materialize once so the
    // caller's derivation (q125's generated phash union, q122's scan)
    // doesn't re-execute per pass
    val withP = df.withColumn("__grp", prefix).localCheckpoint(true)
    val Array(kmin, kmax) = withP.agg(min(col("__grp")), max(col("__grp"))).head() match {
      case r if r.isNullAt(0) => return df.withColumn(outCol, lit(null).cast("long"))
      case r => Array(r.getLong(0), r.getLong(1))
    }
    require(kmin >= 0, "GlobalRank.byStringKey requires ASCII-leading keys " +
      "(first byte < 0x80); normalize or hash-prefix the key first")
    val span = (BigInt(kmax) - BigInt(kmin)) + 1
    val width = ((span + buckets - 1) / buckets).max(1).toLong
    val withB = withP.withColumn("__grb", ((col("__grp") - kmin) / width).cast("int"))

    val w = Window.partitionBy("__grb").orderBy(col(keyCol).asc, col(tieCol).cast("long").asc)
    val local = withB.withColumn("__grlocal", row_number().over(w).cast("long"))

    val counts = withB.groupBy("__grb").agg(count(lit(1)).as("__grn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) => val o = (b, acc); acc += n; o }
    val offCol = offsets.foldLeft(lit(0L)) { case (c, (b, o)) =>
      when(col("__grb") === b, lit(o)).otherwise(c)
    }
    local.withColumn(outCol, col("__grlocal") + offCol)
      .drop("__grp", "__grb", "__grlocal")
  }

  /** Appends `outCol` = 1-based global row number ordered by
    * (`longCol` asc, `strCol` asc) — the composite-key rank the
    * SetSimJoin sparse path needs for its (df, tok) dictionary order —
    * with the same two-pass shape as [[byStringKey]] but SAMPLE-BASED
    * range bucketing (`repartitionByRange`), so heavily duplicated
    * long keys (df = 1 owns most of a Zipf vocabulary) still spread
    * across buckets by the string tiebreaker instead of collapsing
    * into one:
    *
    *  1. range-partition by (longCol, strCol) into `buckets` ranges
    *     (sampled split points; ties cannot straddle a boundary because
    *     the composite key is unique) and eagerly localCheckpoint, so
    *     the count pass and the rank pass see the SAME partitioning;
    *  2. per-bucket local row_number (window partitioned by the bucket
    *     id — each task sorts ~N/P rows, never a SinglePartition);
    *  3. per-bucket row counts (P longs on the driver — a parallelism
    *     knob, never data-sized) become exclusive offsets added back
    *     map-side.
    *
    * (`longCol`, `strCol`) pairs must be unique (SetSimJoin's
    * dictionary keys them by distinct token), making the rank
    * deterministic end to end. */
  def byLongStringKey(df: DataFrame, longCol: String, strCol: String,
                      outCol: String, buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val parted = df
      .repartitionByRange(buckets, col(longCol).asc, col(strCol).asc)
      .withColumn("__grb", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy("__grb").agg(count(lit(1)).as("__grn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) => val o = (b, acc); acc += n; o }
    val offCol = offsets.foldLeft(lit(0L)) { case (c, (b, o)) =>
      when(col("__grb") === b, lit(o)).otherwise(c)
    }
    val w = Window.partitionBy("__grb").orderBy(col(longCol).asc, col(strCol).asc)
    parted.withColumn(outCol, row_number().over(w).cast("long") + offCol)
      .drop("__grb")
  }
}
