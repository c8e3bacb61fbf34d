package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CPython-compatible Mersenne Twister + random.sample, for row-for-row
  * parity with the reference's seeded `-rng` mode
  * (analyse_polygons.py:192,225-226: random.seed(42);
  * random.sample(features, n)). Algorithms are the public MT19937
  * reference implementation and CPython's documented sample() selection
  * logic; goldens generated from CPython pin the port. */
final class MT19937(seed: Long) {
  private val N = 624
  private val mt = new Array[Int](N)
  private var mti = N + 1

  initByArray(splitKey(seed))

  private def splitKey(s: Long): Array[Int] = {
    // CPython random.seed(int): key = abs(n) split into 32-bit little-endian words
    val a = math.abs(s)
    if (a == 0) Array(0)
    else {
      var v = a
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (v > 0) { buf += (v & 0xffffffffL).toInt; v = v >>> 32 }
      buf.toArray
    }
  }

  private def initGenrand(s: Int): Unit = {
    mt(0) = s
    var i = 1
    while (i < N) {
      mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
      i += 1
    }
    mti = N
  }

  private def initByArray(key: Array[Int]): Unit = {
    initGenrand(19650218)
    var i = 1; var j = 0
    var k = math.max(N, key.length)
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) + key(j) + j
      i += 1; j += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      if (j >= key.length) j = 0
      k -= 1
    }
    k = N - 1
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941)) - i
      i += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      k -= 1
    }
    mt(0) = 0x80000000
  }

  /** next 32 random bits (as unsigned in a Long). */
  def nextUInt32(): Long = {
    if (mti >= N) {
      val M = 397
      val UPPER = 0x80000000
      val LOWER = 0x7fffffff
      var kk = 0
      while (kk < N - M) {
        val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
        mt(kk) = mt(kk + M) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      while (kk < N - 1) {
        val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
        mt(kk) = mt(kk + (M - N)) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      val y = (mt(N - 1) & UPPER) | (mt(0) & LOWER)
      mt(N - 1) = mt(M - 1) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      mti = 0
    }
    var y = mt(mti); mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y.toLong & 0xffffffffL
  }

  def getrandbits(k: Int): Long = {
    require(k > 0 && k <= 32)
    nextUInt32() >>> (32 - k)
  }

  /** CPython _randbelow_with_getrandbits. */
  def randbelow(n: Int): Int = {
    if (n <= 0) return 0
    val k = 32 - Integer.numberOfLeadingZeros(n) // bit_length
    var r = getrandbits(k)
    while (r >= n) r = getrandbits(k)
    r.toInt
  }
}

object PyRandom {

  /** CPython random.sample(range(n), k) after random.seed(seed):
    * the selected POSITIONS in selection order. */
  def sampleIndices(seed: Long, n: Int, k: Int): Array[Int] = {
    require(k <= n, "sample larger than population")
    val rng = new MT19937(seed)
    val result = new Array[Int](k)
    var setsize = 21
    if (k > 5) setsize += math.pow(4, math.ceil(math.log(k * 3.0) / math.log(4))).toInt
    if (n <= setsize) {
      val pool = Array.range(0, n)
      var i = 0
      while (i < k) {
        val j = rng.randbelow(n - i)
        result(i) = pool(j)
        pool(j) = pool(n - i - 1)
        i += 1
      }
    } else {
      val selected = scala.collection.mutable.HashSet.empty[Int]
      var i = 0
      while (i < k) {
        var j = rng.randbelow(n)
        while (selected.contains(j)) j = rng.randbelow(n)
        selected += j
        result(i) = j
        i += 1
      }
    }
    result
  }

  /** P3: seeded random-N rows of a DataFrame in CPython selection order
    * (the reference's feature-list order = the frame's natural row order).
    * Output carries `sample_rank` (0-based selection position). */
  def seededSample(spark: SparkSession, df: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val n = df.count()
    require(n <= Int.MaxValue)
    val idx = sampleIndices(seed, n.toInt, k).zipWithIndex // (position, rank)
    import spark.implicits._
    val ranks = idx.map { case (pos, rank) => (pos.toLong, rank) }.toSeq.toDF("_pos", "sample_rank")
    val withPos = df.rdd.zipWithIndex.map { case (row, i) => (i, row) }
    val rowsWithPos = spark.createDataFrame(
      withPos.map { case (i, row) => org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i) },
      df.schema.add("_pos", "long"))
    rowsWithPos.join(broadcast(ranks), Seq("_pos")).drop("_pos")
  }
}
