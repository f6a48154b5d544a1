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
    val schema = tableSchemaFields(spark, path)
    schema.iterator.zipWithIndex.collect {
      // ORDINAL_POSITION is 1-based in information schema
      case (name, i) if !banned.contains(name) => CatalogRow(table, name, i + 1)
    }.toSeq
  }

  /** Top-level field NAMES of a Parquet table, in footer order.
    *
    * The catalog needs names and ordinals only, so read ONE footer with
    * the bare parquet-hadoop API instead of `spark.read.parquet(path)`:
    * the DataFrameReader path builds a full InMemoryFileIndex + inferred
    * StructType per table PER CATALOG CALL — ~100 ms of driver-side
    * machinery each — while the footer's top-level field names (what
    * Spark's own inference returns, in the same order) cost one ~ms
    * metadata read. A directory table reads its first data file's footer
    * (the same single-footer choice non-merging Spark inference makes;
    * catalog tables here are written with one schema). Falls back to the
    * DataFrameReader on anything unexpected (empty dir, corrupt footer)
    * so error behavior is unchanged. */
  private def tableSchemaFields(spark: SparkSession, path: String): Seq[String] =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      val dataFile =
        if (st.isDirectory) {
          val parts = fs.listStatus(p).iterator
            .filter { s =>
              val n = s.getPath.getName
              s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
                s.getLen > 0
            }
            .toSeq.sortBy(_.getPath.getName)
          parts.headOption.getOrElse(sys.error(s"no data files under $path")).getPath
        } else p
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(dataFile, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val fields = reader.getFooter.getFileMetaData.getSchema.getFields
        (0 until fields.size()).map(i => fields.get(i).getName)
      } finally reader.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        spark.read.parquet(path).schema.fields.toSeq.map(_.name)
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
    // one directory listing shared by the 27 chunks: each chunk still
    // scans only its own tables' footers (the reference's independence
    // property is about the per-chunk FOOTER work, not the listing)
    val tables = listTables(schemaDir)
    ("_" + ('A' to 'Z').mkString).flatMap { letter =>
      tables
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
