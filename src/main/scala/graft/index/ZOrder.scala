package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, shiftleft}

/** Z-order (Morton) space-filling-curve key over 2-D cell coordinates —
  * the data-LAYOUT half of the spatial story (CellIndex/HexIndex are the
  * JOIN half). Interleaving the bits of (e, n) maps 2-D proximity to 1-D
  * key proximity, so a tile catalog written `repartitionByRange + sortWithin
  * Partitions` on this key gets file-level spatial locality: any 2-D
  * bounding-box scan touches O(perimeter) parquet row-groups because the
  * per-file min/max statistics on the key prune everything far from the
  * box (the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`). At
  * 100 TB this is what turns "scan the national tile table for one city"
  * from a full scan into a few hundred file reads.
  *
  * Pure built-in column arithmetic (shift/AND/OR magic-number bit
  * spreading, cf. Hacker's Delight §7-2 / the public "Interleave bits by
  * Binary Magic Numbers" method) — no UDF, stays inside whole-stage
  * codegen, and is replicable in any engine with 64-bit integer ops
  * (the q52 oracle re-derives it in DuckDB SQL).
  */
object ZOrder {

  /** Spread the low 16 bits of a long onto the even bit positions of a
    * 32-bit field: ...b2 b1 b0 -> ...0 b2 0 b1 0 b0. */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key of two 16-bit coords: e on even bits, n on odd bits.
    * Bijective on [0,2^16)^2, so ordering by it is total given distinct
    * (e, n); monotone in each coordinate holding the other fixed. */
  def key(e: Column, n: Column): Column =
    spread16(e).bitwiseOR(shiftleft(spread16(n), 1))

  /** Reference bit-by-bit implementation for tests. */
  def keyRef(e: Int, n: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((e >> i) & 1).toLong << (2 * i)
      z |= ((n >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }
}
