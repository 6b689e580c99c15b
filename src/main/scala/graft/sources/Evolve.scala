package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Version-drift-tolerant parquet ingestion — the batch sibling of
  * [[EventTime]]'s timestamp normalization and [[DocSource]]'s
  * permissive JSONL/CSV readers. A long-lived 100 TB table is written
  * by YEARS of producer versions: columns get added, renamed, and
  * integer-widened (int → bigint is the classic id overflow
  * migration), and `spark.read.parquet(dir)` either serves whichever
  * footer it sampled first or — with `mergeSchema` — refuses
  * conflicting physical types outright. This reader makes the drift an
  * explicit, declared contract instead of a crash:
  *
  *  1. files are grouped by their FOOTER schema (distinct-schema count
  *     is bounded by producer-version count, never file count),
  *  2. per group: `renames` map legacy column names onto their
  *     canonical ones,
  *  3. the groups' schemas are merged with numeric WIDENING
  *     (byte&lt;short&lt;int&lt;long, float&lt;double — lossless
  *     promotions only; a genuine type conflict still fails loudly,
  *     because silently coercing e.g. string↔long hides producer
  *     bugs),
  *  4. each group is cast to the merged schema and union'd BY NAME,
  *     missing columns null-filled.
  *
  * Cost shape: one driver-side footer read per file (metadata-only —
  * the identical I/O `mergeSchema` already pays, just surfaced) and
  * one Spark scan per DISTINCT schema version; row data is read once.
  * Real deployments usually version by subdirectory, which keeps the
  * listing trivial; this reader does not require that layout.
  */
object Evolve {

  /** Widen two types if a lossless numeric promotion exists. */
  private[graft] def widen(a: DataType, b: DataType): Option[DataType] = {
    val intRank: Map[DataType, Int] =
      Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
    (a, b) match {
      case (x, y) if x == y => Some(x)
      case (x, y) if intRank.contains(x) && intRank.contains(y) =>
        Some(if (intRank(x) >= intRank(y)) x else y)
      case (FloatType, DoubleType) | (DoubleType, FloatType) =>
        Some(DoubleType)
      case _ => None
    }
  }

  /** Merge normalized per-version schemas into the serving schema:
    * union of columns (first-seen order), numeric widening on
    * conflicts, nullable everywhere (any version may lack a column). */
  private[graft] def mergeSchemas(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap[String, DataType]()
    schemas.foreach(_.foreach { f =>
      order.get(f.name) match {
        case None => order(f.name) = f.dataType
        case Some(t) =>
          order(f.name) = widen(t, f.dataType).getOrElse(throw
            new IllegalArgumentException(
              s"Evolve: column '${f.name}' has irreconcilable types " +
                s"$t vs ${f.dataType} across file versions — only " +
                "integral/float widening is performed implicitly; " +
                "resolve with an explicit migration"))
      }
    })
    StructType(order.toSeq.map { case (n, t) => StructField(n, t, nullable = true) })
  }

  /** Read every parquet file under `path` (recursively), normalizing
    * producer drift: `renames` maps LEGACY names → canonical names;
    * added columns null-fill; integral/float widths promote. Returns
    * one DataFrame in the merged canonical schema. */
  def readParquet(spark: SparkSession, path: String,
                  renames: Map[String, String] = Map.empty): DataFrame = {
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
    // walk the tree ourselves (listFiles(recursive) cannot skip dirs):
    // hidden path components — "." / "_" prefixed, except "_x=" hive
    // partition dirs — are maintenance debris (_compact_tmp_*,
    // _old_*, .staging) that normal Spark reads ignore; reading them
    // here would double-read stale rows a crashed swap left behind
    val files = scala.collection.mutable.ArrayBuffer[String]()
    def hidden(n: String): Boolean =
      n.startsWith(".") || SwapDir.isDebrisName(n) ||
        (n.startsWith("_") && !n.contains("="))
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      if (!hidden(s.getPath.getName)) {
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet"))
          files += s.getPath.toString
      }
    }
    walk(hadoopPath)
    require(files.nonEmpty, s"Evolve: no parquet files under $path")
    // footer-only schema probe per file, parallelized on a bounded
    // driver pool (each probe is one metadata-only round trip; serial
    // probing makes the driver the bottleneck on wide file listings —
    // the same trade Spark's own mergeSchema makes, which probes
    // footers in a Spark job)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, files.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val probed =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.traverse(files.toSeq) { f =>
          scala.concurrent.Future((spark.read.parquet(f).schema, f))
        }, scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    // group by the LOADED schema
    val byStatedSchema: Seq[(StructType, Seq[String])] = probed
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toSeq
      // deterministic version order (groupBy's map order is not)
      .sortBy(_._1.json)
    def normalize(df: DataFrame): DataFrame =
      renames.foldLeft(df) { case (d, (legacy, canon)) =>
        if (d.columns.contains(legacy) && !d.columns.contains(canon))
          d.withColumnRenamed(legacy, canon)
        else d
      }
    val normalized = byStatedSchema.map { case (schema, fs0) =>
      normalize(spark.read.schema(schema).parquet(fs0: _*))
    }
    val target = mergeSchemas(normalized.map(_.schema))
    normalized.map { df =>
      val have = df.columns.toSet
      df.select(target.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
