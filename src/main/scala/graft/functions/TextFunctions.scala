package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis scalar kernels for the large-scale training-data
  * pipeline: document fingerprinting (Rabin-Karp rolling hash +
  * winnowing), SimHash, and MinHash signatures. All are deterministic and
  * md5-based where cross-engine (DuckDB) reproduction matters. */
object TextHash {

  /** First 8 bytes of md5(s), big-endian, as a Long — portable to any
    * engine with md5 (used so oracles can replicate bit-for-bit). */
  def md5_64(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** Rabin-Karp rolling hashes of all k-grams (byte-level, base 257 mod
    * 2^61-1), the classic content-defined fingerprint primitive. */
  def rollingHashes(text: String, k: Int): Array[Long] = {
    val bytes = text.getBytes("UTF-8")
    if (bytes.length < k) return Array.empty
    val Mod = (1L << 61) - 1
    val Base = 257L
    def mulMod(a: Long, b: Long): Long = {
      // 61-bit safe multiply via Math.multiplyHigh
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      // fold 128-bit into mod 2^61-1: (x mod 2^61) + (x >> 61)
      var r = (lo & Mod) + ((lo >>> 61) | (hi << 3)) // hi*2^64 = hi*8 * 2^61
      r = (r & Mod) + (r >>> 61)
      if (r >= Mod) r - Mod else r
    }
    var pow = 1L
    (1 until k).foreach(_ => pow = mulMod(pow, Base))
    val out = new Array[Long](bytes.length - k + 1)
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      if (i >= k) {
        // drop the oldest byte (it carries factor Base^(k-1)) before shifting
        val drop = mulMod((bytes(i - k) & 0xff).toLong, pow)
        h = (h - drop + Mod) % Mod
      }
      h = (mulMod(h, Base) + (bytes(i) & 0xff)) % Mod
      if (i >= k - 1) out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowing: minimum hash per sliding window of `w` k-gram hashes,
    * deduplicated consecutively — the standard document fingerprint set. */
  def winnow(hashes: Array[Long], w: Int): Array[Long] = {
    if (hashes.isEmpty) return Array.empty
    if (hashes.length <= w) return Array(hashes.min)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i + w <= hashes.length) {
      var m = hashes(i)
      var j = i + 1
      while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
      if (out.isEmpty || out.last != m) out += m
      i += 1
    }
    out.toArray
  }

  /** 64-bit SimHash over tokens (md5-based bit votes). */
  def simHash(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = md5_64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature: per hash i, min over shingles of mix(md5_64 ^ seed_i). */
  def minHash(shingles: Iterable[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val base = md5_64(s)
      var i = 0
      while (i < numHashes) {
        val h = graft.data.Synthetic.mix(base ^ (i.toLong * 0x9e3779b97f4a7c15L))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Portable MinHash family: h_i(s) = md5_64(i + "|" + s), signed min.
    * Unlike [[minHash]] (one md5 + a wrapping-multiply mix per extra
    * hash — the fast path), every hash is a plain md5 of a short string,
    * so ANY engine with md5 reproduces the signature bit-for-bit (the
    * mix's wrapping 64-bit multiply has no portable SQL form). Used where
    * an independent cross-engine oracle matters more than hash cost. */
  def minHashPortable(shingles: Iterable[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      var i = 0
      while (i < numHashes) {
        val h = md5_64(i.toString + "|" + s)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }
}

/** winnowed rolling-hash fingerprints of a string: array<long>. */
case class Fingerprint(child: Expression, k: Int = 5, window: Int = 4)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextHash.winnow(
      TextHash.rollingHashes(v.asInstanceOf[UTF8String].toString, k), window))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit simhash of a token array. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val tokens = (0 until arr.numElements()).iterator
      .map(i => arr.getUTF8String(i)).filter(_ != null).map(_.toString).toSeq
    TextHash.simHash(tokens)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature of a shingle array: array<long> of length numHashes.
  * `portable = true` selects the md5-only hash family
  * ([[TextHash.minHashPortable]]) that cross-engine oracles replicate. */
case class MinHashSig(child: Expression, numHashes: Int = 16,
                      portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val shingles = (0 until arr.numElements()).iterator
      .map(i => arr.getUTF8String(i)).filter(_ != null).map(_.toString).toSeq
    new GenericArrayData(
      if (portable) TextHash.minHashPortable(shingles, numHashes)
      else TextHash.minHash(shingles, numHashes))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two 64-bit hashes (for simhash dedup). */
case class Hamming64(left: Expression, right: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = left.nullable || right.nullable
  override def dataType: DataType = IntegerType
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input)
    if (l == null || r == null) null
    else java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}
