package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic ingest/egress for the engine's tables.
  *
  * The reference's only "sources" are metadata (information schema + YAML
  * config); its sinks are SQL/YAML files. On the data plane this engine
  * reads/writes the standard lake formats. Scale rules baked in:
  *
  *  - schema is always supplied or read from footers — never inferred by a
  *    full file scan for CSV/JSON (`inferSchema` is a second pass over
  *    100 TB);
  *  - writes support partitioning columns (directory pruning for readers)
  *    and bucketing (shuffle-free joins, see BucketingSpec);
  *  - `maxPartitionBytes`-sized splits come free with the DataSource V2
  *    file readers.
  */
object DataSources {

  /** Read `path` in the given format. CSV/JSON require a schema. */
  def read(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None): DataFrame = {
    graft.Tables.prepare(spark)
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    format match {
      case "csv" => withSchema.option("header", "true").load(path)
      case _ => withSchema.load(path)
    }
  }

  /** Write with optional directory partitioning. */
  def write(df: DataFrame, format: String, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.format(format).mode(mode)
    val withParts = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    format match {
      case "csv" => withParts.option("header", "true").save(path)
      case _ => withParts.save(path)
    }
  }
}
