package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Exprs

/** Scale-safe near-duplicate candidate generation for 64-bit content
  * hashes (simhash, phash): banding + bucket equi-join, never an
  * all-pairs product. */
object NearDup {

  /** Banded-hash near-dup self-join: the hash is split into
    * ceil(64/bandBits) bands; rows sharing ANY band become a candidate
    * pair; an exact hamming refine keeps pairs <= maxHamming apart.
    *
    * Recall is EXACT when maxHamming < nBands: a pair differing in at
    * most nBands-1 bits leaves at least one band untouched (pigeonhole),
    * so it lands in a shared bucket. Above that it degrades gracefully
    * (pairs spreading their differing bits across every band are missed).
    *
    * The plan is a plain (band, bucket) equi-join — shuffle-partitionable
    * and skew-handleable like any key — so it scales where a crossJoin
    * cannot. Output: (a_id, b_id, hamming), a_id < b_id, deduplicated
    * across bands. */
  def bandedSelfJoin(df: DataFrame, idCol: String, hashCol: String,
                     bandBits: Int, maxHamming: Int): DataFrame = {
    require(bandBits >= 1 && bandBits <= 32, s"bandBits $bandBits out of range")
    val nBands = (64 + bandBits - 1) / bandBits
    val mask = (1L << bandBits) - 1
    // The (id, hash) projection feeds BOTH sides of the bucket
    // equi-join; without eager materialization the caller's hash
    // DERIVATION (e.g. q47's md5-simhash over every token of the
    // corpus) executes once per side. The checkpointed frame is 16
    // bytes/row — the cheapest point to cut: banding re-derives from it
    // in-row, the corpus text is scanned once.
    val h = df.select(col(idCol).as("a_id"), col(hashCol).as("a_h"))
      .localCheckpoint(true)
    val banded = h.select(col("a_id"), col("a_h"),
        posexplode(array((0 until nBands).map(b =>
          shiftrightunsigned(col("a_h"), b * bandBits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val other = banded.select(col("a_id").as("b_id"), col("a_h").as("b_h"),
      col("band"), col("bucket"))
    banded.join(other, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_h", "b_h").distinct()
      .withColumn("hamming",
        Exprs.col(Hamming64(Exprs.expr(col("a_h")), Exprs.expr(col("b_h")))))
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Banded near-dup join of a PROBE frame against a BASE frame — the
    * INGEST shape: a small new batch is matched against a huge existing
    * corpus without the corpus ever fanning out by more than nBands or
    * entering a cross product. Both sides explode their band buckets and
    * meet in a plain (band, bucket) equi-join, so the base side shuffles
    * once on a partitionable key (or stays put while the banded probe
    * broadcasts, when the batch is small — AQE's call). Same pigeonhole
    * recall contract as [[bandedSelfJoin]]: EXACT when
    * maxHamming < nBands. Output (probe_id, base_id, hamming),
    * deduplicated across bands; ids need not be disjoint (a shared id
    * matches like any other pair — callers filter if self-matches are
    * meaningless). */
  def bandedJoin(probe: DataFrame, probeId: String, probeHash: String,
                 base: DataFrame, baseId: String, baseHash: String,
                 bandBits: Int, maxHamming: Int): DataFrame = {
    require(bandBits >= 1 && bandBits <= 32, s"bandBits $bandBits out of range")
    val nBands = (64 + bandBits - 1) / bandBits
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, id: String, h: String, outId: String, outH: String) =
      df.select(col(id).as(outId), col(h).as(outH),
          posexplode(array((0 until nBands).map(b =>
            shiftrightunsigned(col(h), b * bandBits).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded(probe, probeId, probeHash, "probe_id", "p_h")
      .join(banded(base, baseId, baseHash, "base_id", "b_h"), Seq("band", "bucket"))
      .select("probe_id", "base_id", "p_h", "b_h").distinct()
      .withColumn("hamming",
        Exprs.col(Hamming64(Exprs.expr(col("p_h")), Exprs.expr(col("b_h")))))
      .where(col("hamming") <= maxHamming)
      .select("probe_id", "base_id", "hamming")
  }
}
