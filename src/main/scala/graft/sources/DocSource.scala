package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interchange-format document ingestion — the boundary where "someone
  * else's files" become the engine's `documents` table.
  *
  * Real corpora arrive as JSONL (the LLM-data lingua franca) or CSV
  * dumps, from producers whose schemas drift. The reader is therefore
  * deliberately strict about STRUCTURE and lenient about ENCODING:
  *
  *  - the caller names the target schema (a `StructType`); inference is
  *    off — schema inference over 100 TB is a full extra pass, and it
  *    changes silently when the data does (the events-timestamp lesson,
  *    see [[EventTime]]);
  *  - columns are reordered/selected to the target; target columns the
  *    file lacks come back as typed nulls (additive schema drift reads
  *    cleanly), extra file columns are dropped;
  *  - malformed lines don't kill the job OR vanish: PERMISSIVE mode
  *    routes them to a corrupt-record column, [[readJsonl]] returns
  *    them separately so the pipeline can count/quarantine them
  *    (silently dropped rows are how corpora rot).
  */
object DocSource {

  private val Corrupt = "_graft_corrupt"

  /** Read JSONL into `target`, returning (good rows, corrupt lines).
    * `multiLine=false`: JSONL is splittable line-by-line — a 100 TB
    * dump parallelizes per line, while a multiline JSON array would
    * parse per FILE. */
  def readJsonl(spark: SparkSession, path: String,
                target: StructType): (DataFrame, DataFrame) = {
    val readSchema = target.add(StructField(Corrupt, StringType))
    val raw = spark.read
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      // Spark refuses corrupt-column-only queries over raw files
      // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN): the
      // quarantine split must come off a materialized parse. cache() is
      // lazy — a caller that never executes `bad` pays nothing extra;
      // one that does pays one parse of the ingested batch (which a
      // quarantine pass inherently costs in any engine).
      .cache()
    val good = raw.filter(col(Corrupt).isNull)
      .select(target.fieldNames.map(col).toSeq: _*)
    val bad = raw.filter(col(Corrupt).isNotNull).select(col(Corrupt))
    (good, bad)
  }

  /** Write JSONL (one object per line, UTF-8). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Read CSV into `target` — header respected, RFC-4180 quoting with
    * embedded newlines (`multiLine`), malformed rows to the corrupt
    * column like [[readJsonl]]. Note the scale trade the option
    * implies: multiline-quoted CSV files are not line-splittable, so
    * parallelism is per file — prefer JSONL for big corpora. */
  def readCsv(spark: SparkSession, path: String,
              target: StructType): (DataFrame, DataFrame) = {
    val readSchema = target.add(StructField(Corrupt, StringType))
    val raw = spark.read
      .schema(readSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .csv(path)
      .cache() // same corrupt-column restriction as readJsonl
    val good = raw.filter(col(Corrupt).isNull)
      .select(target.fieldNames.map(col).toSeq: _*)
    val bad = raw.filter(col(Corrupt).isNotNull).select(col(Corrupt))
    (good, bad)
  }

  /** Write CSV with header + full quoting (round-trips embedded
    * newlines/commas/quotes). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
}
