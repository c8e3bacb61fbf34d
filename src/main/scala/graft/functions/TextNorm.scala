package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-robust dedup-key normalization: NFC → accent strip (NFD +
  * drop combining marks + recompose) → root-locale lowercase →
  * whitespace collapse. This is the canonicalization step in front of
  * every exact-hash dedup (q11) when the corpus is NOT ASCII — the
  * precomposed "Café" (U+00E9) and the decomposed "Café"
  * (e + U+0301) are byte-different but the same text, and a 100 TB
  * multilingual crawl is full of both.
  *
  * Every stage is pinned to the published Unicode algorithms so the SQL
  * oracle (DuckDB utf8proc: nfc_normalize / strip_accents / lower /
  * regexp whitespace collapse) computes the identical key: NFC/NFD are
  * normative Unicode, accent stripping removes exactly the \p{Mn}
  * combining marks of the canonical decomposition, and lowercasing
  * happens AFTER stripping so it only ever sees unaccented letters
  * (locale-free). Map-only scalar — the dedup groupBy downstream is the
  * scale shape of q11. */
case class NormalizeText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    import java.text.Normalizer
    val nfc = Normalizer.normalize(v.toString, Normalizer.Form.NFC)
    val stripped = Normalizer.normalize(nfc, Normalizer.Form.NFD)
      .replaceAll("\\p{Mn}+", "")
    val recomposed = Normalizer.normalize(stripped, Normalizer.Form.NFC)
    // Explicit mirrored trim, NOT String.trim: trim strips every char
    // <= U+0020 while the oracle chain strips exactly this class — the
    // two Unicode stacks must agree on \r and control-char boundaries.
    // Anchors are \A/\z, not ^/$: Java's $ also matches BEFORE a final
    // line terminator (U+0085/U+2028/U+2029), while the oracle's RE2 $
    // only matches true end-of-text — a doc ending in space + U+2028 would
    // trim differently under ^$.
    val collapsed = recomposed.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\A[ \\t\\n\\r]+|[ \\t\\n\\r]+\\z", "")
      .replaceAll("[ \\t\\n\\r]+", " ")
    UTF8String.fromString(collapsed)
  }

  override protected def withNewChildInternal(c: Expression): NormalizeText = copy(child = c)
}
