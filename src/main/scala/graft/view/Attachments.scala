package graft.view

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** CouchDB-style document attachments: every doc may carry an
  * `_attachments` column — a `map<name, struct<content_type, data,
  * length, digest, stub>>` mirroring the reference's
  * `doc._attachments` JSON shape (pouchdb `put(doc)` with
  * `_attachments`, `putAttachment`, `getAttachment`,
  * `removeAttachment`). The digest is `md5-<hex>` over the payload
  * bytes, computed distributed via the codegen'd builtin `md5`.
  *
  * Query-side semantics live in [[View]]: `include_docs` returns STUB
  * entries by default (metadata only, `data` null, `stub=true` — the
  * reference's default response shape) and the full payload only under
  * `attachments=true` ([[QueryOpts.attachments]]) — at 100 TB the
  * difference between an index-sized response and shipping every blob.
  *
  * The per-entry map rewrites use `map_filter`/`transform_values`
  * (interpreted per ELEMENT, not per row); attachment maps are
  * bounded-small (a handful of named blobs per doc), so the
  * interpreted cost is O(names), unlike the per-character HOF trap.
  */
object Attachments {

  /** The reserved attachments column, as in the reference doc model. */
  val ATT = "_attachments"

  private def entryFor(data: Column, contentType: String): Column = struct(
    lit(contentType).as("content_type"),
    data.as("data"),
    octet_length(data).cast("long").as("length"),
    concat(lit("md5-"), md5(data)).as("digest"),
    lit(false).as("stub"))

  /** Add (or replace — reference `putAttachment` upsert semantics) a
    * named attachment built from a binary column. */
  def put(docs: DataFrame, name: String, data: Column,
          contentType: String): DataFrame = {
    val one = map(lit(name), entryFor(data, contentType))
    if (docs.columns.contains(ATT))
      docs.withColumn(ATT,
        map_concat(map_filter(col(ATT), (k, _) => k =!= name), one))
    else docs.withColumn(ATT, one)
  }

  /** Reference `removeAttachment`. */
  def remove(docs: DataFrame, name: String): DataFrame =
    if (!docs.columns.contains(ATT)) docs
    else docs.withColumn(ATT, map_filter(col(ATT), (k, _) => k =!= name))

  /** Reference `getAttachment`: one attachment's entry per doc (null
    * where absent), keyed by the given id column. */
  def get(docs: DataFrame, idCol: Column, name: String): DataFrame =
    docs.select(idCol.as("_id"), element_at(col(ATT), name).as("attachment"))

  /** The default (no `attachments=true`) response shape: every entry
    * reduced to its stub — metadata kept, payload dropped. */
  private[view] def stubbed(atts: Column): Column =
    transform_values(atts, (_, v) => struct(
      v.getField("content_type").as("content_type"),
      lit(null).cast(BinaryType).as("data"),
      v.getField("length").as("length"),
      v.getField("digest").as("digest"),
      lit(true).as("stub")))
}
