package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import graft.collation.{CollationCodec, CollationKey}

/** Public column functions of the graft engine. */
object gfunctions {

  /** Order-preserving CouchDB-collation encoding of any column (see
    * [[graft.collation.CollationCodec]]). Binary comparisons / sorts on the
    * result implement CouchDB view key order. */
  def collation_key(c: Column): Column = Bridge.column(CollationKey(Bridge.expression(c)))

  /** Locale-aware variant: string payloads use java.text.Collator weight
    * bytes (root locale) instead of UTF-8 code points — the optional
    * ICU-style mode for CouchDB-faithful non-ASCII ordering ("é" sorts
    * with "e", not after "z"). Cross-type order is unchanged. */
  def collation_key_locale(c: Column): Column =
    Bridge.column(CollationKey(Bridge.expression(c), locale = true))

  /** Driver-side encoding of a literal key (for startkey/endkey/key/keys). */
  def collation_key_lit(v: Any): Array[Byte] = CollationCodec.encodeScala(v)

  /** Engine-portable 4-decimal rounding: `floor(x*10000 + 0.5)/10000`.
    * `round(x, 4)` half-up semantics differ between engines at exact
    * .00005 boundaries (observed at sf0.1); this formula is the same
    * double-op sequence everywhere, so results are bit-identical.
    * (Rounds toward +inf at ties, including for negatives — consistent
    * across engines, which is what the correctness gate needs.) */
  def round4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{floor, lit}
    floor(c * 10000.0 + lit(0.5)).cast("double") / 10000.0
  }
}
