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

  /** Driver-side encoding of a literal key (for startkey/endkey/key/keys). */
  def collation_key_lit(v: Any): Array[Byte] = CollationCodec.encodeScala(v)
}
