package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Fingerprint, Hamming64, MinHashSig, SimHash64}
import graft.pipeline.{CellToTileCode, KRingCells, PointCell, SlippyKeyToCell, TileCodeToCell, ToOsgbEN}

/** SparkSessionExtensions registering the engine's scalar expressions as
  * SQL functions, so the whole geo/text surface is usable from
  * `spark.sql(...)`:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT graft_tile_code(401, 126)")          -- 'SU0126'
  * spark.sql("SELECT graft_to_osgb(-2.4729, 51.4309).eastings")
  * spark.sql("SELECT graft_simhash64(split(text, ' ')) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, (arity, builder)) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity, s"$name expects $arity arguments")
          builder(exprs)
        }))
    }
}

object GraftFunctions {

  val all: Map[String, (Int, Seq[Expression] => Expression)] = Map(
    "graft_tile_code" -> (2, x => CellToTileCode(x(0), x(1))),
    "graft_tile_cell" -> (1, x => TileCodeToCell(x(0))),
    "graft_slippy_cell" -> (2, x => SlippyKeyToCell(x(0), intLit(x(1), "graft_slippy_cell zoom"))),
    "graft_to_osgb" -> (2, x => ToOsgbEN(x(0), x(1))),
    "graft_point_cell" -> (2, x => PointCell(x(0), x(1))),
    "graft_kring" -> (2, x => KRingCells(x(0), intLit(x(1), "graft_kring k"))),
    "graft_simhash64" -> (1, x => SimHash64(x(0))),
    "graft_hamming64" -> (2, x => Hamming64(x(0), x(1))),
    "graft_fingerprint" -> (1, x => Fingerprint(x(0))),
    "graft_minhash" -> (2, x => MinHashSig(x(0), intLit(x(1), "graft_minhash numHashes"))),
    // md5-only hash family: bit-replicable by any engine with md5 (used
    // by the q25 oracle); the default family is the faster mix-based one
    "graft_minhash_portable" -> (2, x => MinHashSig(x(0),
      intLit(x(1), "graft_minhash_portable numHashes"), portable = true)),
    // multi-table sign-LSH bucket ids over an embedding array:
    // (embedding, dim, nPlanes, nTables) -> array<bigint>
    "graft_lsh_buckets" -> (4, x => graft.functions.SignLshBuckets(x(0),
      intLit(x(1), "graft_lsh_buckets dim"),
      intLit(x(2), "graft_lsh_buckets nPlanes"),
      intLit(x(3), "graft_lsh_buckets nTables"), seed = 42L)),
    // spatial image augmentation: (png/jpg bytes, kind) -> PNG bytes,
    // kind in rot90|rot180|rot270|flip_h|flip_v|crop_c
    "graft_augment_image" -> (2, x => graft.img.AugmentImage(x(0), x(1))),
    // (bytes) -> struct(w, h, sum_b, sum_g, sum_r, wsum)
    "graft_pixel_checksum" -> (1, x => graft.img.PixelChecksum(x(0))),
    // (bytes) -> struct(mean_lum, contrast, sharpness)
    "graft_image_quality" -> (1, x => graft.media.ImageQualityStats(x(0))),
    // (bytes) -> struct(n_pix, sum_r.., sumsq_r..): exact integer channel
    // sums for corpus normalization statistics
    "graft_channel_sums" -> (1, x => graft.media.ChannelSums(x(0))),
    // (bytes) -> struct(rms, zcr)
    "graft_audio_features" -> (1, x => graft.media.AudioFeatures(x(0)))
  )

  /** Register into an already-created session (the extensions path only
    * applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, (arity, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        exprs => {
          require(exprs.length == arity, s"$name expects $arity arguments")
          builder(exprs)
        },
        "built-in")
    }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
}
