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
    lit(false).as("stub"),
    // identity-stored entry: no encoding tier (see putEncoded)
    lit(null).cast("string").as("encoding"),
    lit(null).cast("long").as("encoded_length"))

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

  // ------------------------------------------- the gzip encoding tier

  /** CouchDB's default `compressible_types`: attachments of these
    * content types store gzip-ENCODED; everything else (media
    * formats are already entropy-coded) stores identity. */
  def isCompressible(contentType: String): Boolean = {
    val ct = contentType.takeWhile(_ != ';').trim.toLowerCase
    ct.startsWith("text/") || ct == "application/json" ||
      ct == "application/javascript" || ct == "application/xml"
  }

  /** Deterministic gzip: java's GZIPOutputStream writes MTIME 0 and
    * a fixed header, so the encoded bytes are a pure function of the
    * payload — `encoded_length` is stable across runs and engines
    * running the same JVM codec. A UDF is the accepted form here (no
    * Catalyst builtin compresses binary; same confinement rule as
    * image decode). */
  private val gzipUdf = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
  }

  private val gunzipUdf = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try in.readAllBytes() finally in.close()
    }
  }

  /** [[put]] with CouchDB's STORAGE ENCODING: a compressible content
    * type stores the gzip bytes in `data` with `encoding = "gzip"`
    * and `encoded_length` = the stored size, while `length` and
    * `digest` keep describing the DECODED payload (what a client
    * reads back — the identity the rest of the attachment machinery
    * verifies against); a non-compressible type is exactly [[put]].
    * Replication ships the stored (encoded) bytes — the digest-keyed
    * stub optimization composes unchanged because the digest names
    * the logical payload either way. */
  def putEncoded(docs: DataFrame, name: String, data: Column,
                 contentType: String): DataFrame = {
    if (!isCompressible(contentType)) return put(docs, name, data,
      contentType)
    val gz = gzipUdf(data)
    val entry = struct(
      lit(contentType).as("content_type"),
      gz.as("data"),
      octet_length(data).cast("long").as("length"),
      concat(lit("md5-"), md5(data)).as("digest"),
      lit(false).as("stub"),
      lit("gzip").as("encoding"),
      octet_length(gz).cast("long").as("encoded_length"))
    val one = map(lit(name), entry)
    if (docs.columns.contains(ATT))
      docs.withColumn(ATT,
        map_concat(map_filter(col(ATT), (k, _) => k =!= name), one))
    else docs.withColumn(ATT, one)
  }

  /** [[get]] with the DECODE step applied — the client-facing read of
    * a [[putEncoded]] attachment: `data` holds the decoded payload
    * whatever the storage encoding (gunzip for `gzip`, pass-through
    * for identity). */
  def getDecoded(docs: DataFrame, idCol: Column, name: String)
      : DataFrame = {
    val e = element_at(col(ATT), name)
    docs.select(idCol.as("_id"),
      when(e.isNull, lit(null).cast(BinaryType))
        .when(e.getField("encoding") === "gzip",
          gunzipUdf(e.getField("data")))
        .otherwise(e.getField("data")).as("data"),
      e.as("attachment"))
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
      lit(true).as("stub"),
      // CouchDB keeps att_encoding_info on stubs: a client sizing a
      // fetch needs encoded_length without pulling the payload
      v.getField("encoding").as("encoding"),
      v.getField("encoded_length").as("encoded_length")))

  // ----------------------------------------------- attachment replication

  /** The replication TRANSFER leg for attachments — CouchDB's
    * `atts_since` stub optimization, keyed the robust way, by DIGEST
    * (rev positions prove staleness only along one branch; the digest
    * proves the bytes themselves, which is what the wire transfer is
    * for): each source attachment entry whose digest the target
    * already stores ships as a STUB (metadata only, `data` null), and
    * only unknown payloads carry bytes. Returns one row per (doc,
    * attachment): `(id, name, content_type, length, digest, data,
    * stub)`.
    *
    * Scale shape: one map explode (bounded per doc) and ONE hash join
    * on digest against the target's known-digest relation — syncing a
    * corpus where 99% of blobs are unchanged moves 1% of the bytes,
    * which at 100 TB of attachments is the entire point of the
    * protocol. */
  def replicationAttachments(docs: DataFrame, idCol: Column,
                             targetDigests: DataFrame): DataFrame = {
    val rows = docs.filter(col(ATT).isNotNull)
      .select(idCol.as("id"), explode(col(ATT)).as(Seq("name", "_e")))
      .select(col("id"), col("name"),
        col("_e.content_type").as("content_type"),
        col("_e.length").as("length"),
        col("_e.digest").as("digest"),
        col("_e.data").as("data"),
        // gzip-tier entries ship their STORED (encoded) bytes — the
        // whole point of the tier on the wire; the digest still names
        // the decoded payload, so stub dedup composes unchanged
        col("_e.encoding").as("encoding"))
    val known = targetDigests.toDF("digest").distinct()
      .withColumn("_known", lit(true))
    rows.join(known, Seq("digest"), "left")
      .select(col("id"), col("name"), col("content_type"),
        col("length"), col("digest"),
        when(col("_known"), lit(null).cast(BinaryType))
          .otherwise(col("data")).as("data"),
        coalesce(col("_known"), lit(false)).as("stub"),
        col("encoding"))
  }

  /** The target WRITE leg: apply a [[replicationAttachments]] transfer
    * plan. Full entries insert their shipped payloads; stub entries
    * resolve against the target's existing blob store by digest (the
    * stub's contract — the target already holds these bytes). A stub
    * whose digest the store does NOT hold is reported as
    * `missing_stub` with a null payload (CouchDB rejects such a write
    * with `missing_stub`; per-item errors, never a silent phantom).
    * A FULL entry is verified too: a null shipped payload reports
    * `missing_data`, and a shipped payload whose md5 disagrees with
    * its declared `md5-`digest reports `digest_mismatch` (CouchDB
    * rejects a body whose content hash mismatches) — a corrupt or
    * dropped transfer is never silently accepted. `targetStore` is a
    * `(digest, data)` relation; one hash join. */
  def applyTransfer(plan: DataFrame, targetStore: DataFrame): DataFrame = {
    // a pre-encoding-tier plan (no `encoding` column) verifies as
    // identity — the transfer wire format stays backward-compatible
    val p = if (plan.columns.contains("encoding")) plan
            else plan.withColumn("encoding", lit(null).cast("string"))
    // the digest names the DECODED payload; an encoded full entry
    // verifies over its decode, identity entries over the bytes
    val decoded = when(col("encoding") === "gzip", gunzipUdf(col("data")))
      .otherwise(col("data"))
    p.join(
        targetStore.toDF("digest", "_sdata").dropDuplicates("digest"),
        Seq("digest"), "left")
      .select(col("id"), col("name"), col("content_type"),
        col("length"), col("digest"), col("stub"),
        when(!col("stub"), col("data")).otherwise(col("_sdata"))
          .as("data"),
        when(!col("stub") && col("data").isNull, lit("missing_data"))
          .when(!col("stub") && col("digest").startsWith("md5-") &&
            concat(lit("md5-"), md5(decoded)) =!= col("digest"),
            lit("digest_mismatch"))
          .when(!col("stub") || col("_sdata").isNotNull, lit("ok"))
          .otherwise(lit("missing_stub")).as("status"))
  }

  // ----------------------------------------------------- chunked payloads

  /** Chunked payload rows — the scale path for large blobs: instead of
    * one row CELL holding the whole payload (a multi-GB cell blows row
    * groups, shuffle blocks and executor memory), the payload becomes
    * ordered `(doc_id, name, content_type, chunk_idx, n_chunks, data,
    * chunk_digest)` rows of at most `chunkSize` bytes each, safe to
    * partition, shuffle and store like any other relation. The slicing
    * is the codegen'd binary `substr` (the q69 frame-sampling
    * pattern) — one explode per blob, cost O(chunks). An empty payload
    * keeps one empty chunk so the blob round-trips (0 rows would read
    * as a missing attachment); a NULL payload means NO attachment and
    * emits no rows (the alternative — a row with null data and null
    * digest — would reassemble as a phantom). Per-chunk md5 digests localize
    * corruption to a chunk; [[reassemble]] proves the composed payload
    * bit-exact against the whole-payload digest. */
  def chunkRows(docs: DataFrame, id: Column, data: Column, name: String,
                contentType: String, chunkSize: Int = 1 << 20): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be positive")
    val bin = data.cast(BinaryType)
    docs.filter(bin.isNotNull)
      .select(id.cast("long").as("doc_id"), bin.as("_b"),
        greatest(ceil(octet_length(bin).cast("double") / chunkSize)
          .cast("int"), lit(1)).as("n_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("_b"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), lit(name).as("name"),
        lit(contentType).as("content_type"),
        col("chunk_idx"), col("n_chunks").cast("long").as("n_chunks"),
        col("_b").substr(col("chunk_idx") * chunkSize + 1,
          lit(chunkSize)).as("data"))
      .withColumn("chunk_digest", concat(lit("md5-"), md5(col("data"))))
  }

  /** Reassemble [[chunkRows]] back into whole payloads: chunks sort by
    * index and concatenate left-to-right; `digest` is md5 over the
    * COMPOSED bytes, so equality with the original whole-payload
    * digest proves the chunk cycle bit-exact. Docs with missing or
    * duplicated chunks are EXCLUDED (an incomplete payload must never
    * serve as complete) — [[chunkIntegrity]] lists them. Reassembly is
    * the serve-one-attachment path; set operations should stay on the
    * chunk rows. */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("doc_id"), col("name"), col("content_type"))
      .agg(count(lit(1)).as("_got"),
        count_distinct(col("chunk_idx")).as("_dis"),
        max(col("n_chunks")).as("n_chunks"),
        sort_array(collect_list(struct(col("chunk_idx"), col("data"))))
          .as("_cs"))
      .filter(col("_got") === col("n_chunks") &&
        col("_dis") === col("n_chunks"))
      .select(col("doc_id"), col("name"), col("content_type"),
        col("n_chunks"),
        aggregate(col("_cs"), lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x.getField("data"))).as("data"))
      .withColumn("length", octet_length(col("data")).cast("long"))
      .withColumn("digest", concat(lit("md5-"), md5(col("data"))))

  /** Integrity report over [[chunkRows]]: one row per
    * (doc, name, content_type) — the SAME grain [[reassemble]] groups
    * on, so "incomplete" here is exactly "refused there" — whose
    * stored chunks are incomplete or duplicated. */
  def chunkIntegrity(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("doc_id"), col("name"), col("content_type"))
      .agg(max(col("n_chunks")).as("expected"),
        count(lit(1)).as("stored"),
        count_distinct(col("chunk_idx")).as("distinct_idx"))
      .filter(col("stored") =!= col("expected") ||
        col("distinct_idx") =!= col("expected"))
}
