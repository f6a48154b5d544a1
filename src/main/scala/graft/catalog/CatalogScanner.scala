package graft.catalog

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.config.InvalidDatabaseException

/** One catalog row: (TABLE_NAME, COLUMN_NAME, COLUMN_INDEX) — the projection
  * the reference fetches from INFORMATION_SCHEMA.COLUMNS
  * (/root/reference/dbt_schema_builder/queries.py:11-20). */
final case class CatalogRow(tableName: String, columnName: String, columnIndex: Int)

/** Catalog introspection over a "schema directory" of Parquet tables.
  *
  * Spark-first equivalent of the reference's `GetCatalogTask`
  * (/root/reference/dbt_schema_builder/builder.py:40-174). Where the
  * reference queries Snowflake's information schema remotely, we read
  * Parquet footers (schema-only, no data IO — safe at any scale, the
  * catalog is metadata-sized even at 100 TB of data).
  */
object CatalogScanner {

  /** Full scan — one pass over all tables (builder.py:72-99). Tables are the
    * `<name>.parquet` children of the schema dir, sorted by name so output
    * order matches the reference's `ORDER BY TABLE_NAME, COLUMN_INDEX`. */
  def fetchFullCatalog(spark: SparkSession, schemaDir: String,
      bannedColumnNames: Seq[String]): Seq[CatalogRow] = {
    graft.Tables.prepare(spark)
    val banned = bannedColumnNames.toSet
    listTables(schemaDir).flatMap { case (table, path) =>
      scanTable(spark, table, path, banned)
    }
  }

  /** One table's catalog rows (footer read only). */
  private def scanTable(spark: SparkSession, table: String, path: String,
      banned: Set[String]): Seq[CatalogRow] = {
    val schema = spark.read.parquet(path).schema
    schema.fields.iterator.zipWithIndex.collect {
      // ORDINAL_POSITION is 1-based in information schema
      case (f, i) if !banned.contains(f.name) => CatalogRow(table, f.name, i + 1)
    }.toSeq
  }

  /** Chunked fallback — 27 INDEPENDENT scans keyed on first letter `_,A..Z`
    * (builder.py:101-147, queries.py:23-33): each chunk lists and reads only
    * its own tables' footers, so no single scan ever covers the whole
    * schema — the property the reference relies on to duck the result-size
    * ceiling. The letter match is case-insensitive on the first character
    * like `LIKE 'A%'` against uppercase Snowflake names; tables starting
    * with a character outside `_A-Z` fall in no chunk, as in the reference. */
  def fetchCatalogByLetter(spark: SparkSession, schemaDir: String,
      bannedColumnNames: Seq[String]): Seq[CatalogRow] = {
    graft.Tables.prepare(spark)
    val banned = bannedColumnNames.toSet
    ("_" + ('A' to 'Z').mkString).flatMap { letter =>
      listTables(schemaDir)
        .filter { case (t, _) => t.nonEmpty && t.charAt(0).toUpper == letter }
        .flatMap { case (table, path) => scanTable(spark, table, path, banned) }
    }
  }

  /** Adaptive entry point (builder.py:149-174): identifier guard, full scan,
    * fall back to chunked on the reference's specific overflow error. */
  def run(spark: SparkSession, schemaName: String, schemaDir: String,
      bannedColumnNames: Seq[String]): Seq[CatalogRow] = {
    // SQL-injection guard (builder.py:153-159)
    if ("[^a-zA-Z0-9_]".r.findFirstIn(schemaName).isDefined)
      throw new RuntimeException(
        s"Non-word character in schema name '$schemaName'! Possible SQL injection?")
    if (!Files.isDirectory(Paths.get(schemaDir)))
      throw new InvalidDatabaseException(
        s"The schema directory $schemaDir was not found. Make sure schema_config.yml " +
          "file is valid and that the directory exists")
    try fetchFullCatalog(spark, schemaDir, bannedColumnNames)
    catch {
      case e: Exception if e.getMessage != null &&
          e.getMessage.contains("Information schema query returned too much data") =>
        fetchCatalogByLetter(spark, schemaDir, bannedColumnNames)
    }
  }

  /** Sort-group the catalog rows into `{table -> [cols in ordinal order]}`
    * (builder.py:453-474). Driver-side: catalogs are metadata-scale. */
  def getRelations(rows: Seq[CatalogRow]): ListMap[String, Seq[String]] = {
    val grouped = rows.sortBy(r => (r.tableName, r.columnIndex))
    var result = ListMap.empty[String, Seq[String]]
    grouped.foreach { r =>
      result = result.updated(r.tableName, result.getOrElse(r.tableName, Vector.empty) :+ r.columnName)
    }
    result
  }

  /** The catalog as a DataFrame (table_name, column_name, column_index) for
    * SQL-level consumers and the driver's oracle checks. */
  def catalogDF(spark: SparkSession, rows: Seq[CatalogRow]): DataFrame = {
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("column_index", IntegerType, nullable = false)))
    spark.createDataFrame(
      rows.map(r => Row(r.tableName, r.columnName, r.columnIndex)).asJava, schema)
  }

  /** `<table>.parquet` children of a schema dir, sorted by table name. */
  def listTables(schemaDir: String): Seq[(String, String)] = {
    val dir = Paths.get(schemaDir)
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => (p.getFileName.toString.stripSuffix(".parquet"), p.toString))
      .toSeq.sortBy(_._1)
  }
}
