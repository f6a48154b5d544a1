package graft.engine

import java.util.concurrent.ConcurrentHashMap
import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

import graft.config.{BuilderConfig, SourceSchemaOptions}

/** The canonical demo application: app `LMS` in database `PROD`, backed by
  * one raw schema (`RAW.TPCH` = a testdata scale-factor directory), with a
  * PII redaction set and a soft-delete rule — the configuration the driver's
  * correctness queries exercise.
  *
  * Mirrors the reference's fixture shape
  * (/root/reference/tests/test_builder.py:16-38) over real Parquet tables.
  */
object DemoApp {

  val AppDest = "PROD.LMS"
  val RawSchema = "RAW.TPCH"

  /** PII columns redacted in SAFE views; values are opaque SQL literals
    * (docs/redacting_pii.rst:16-19 semantics). */
  val redactions: Map[String, Map[String, String]] = Map(
    "LMS.CUSTOMER" -> Map("C_NAME" -> "'<redacted>'"),
    "LMS.SUPPLIER" -> Map("S_NAME" -> "'<redacted>'"),
    "LMS.EVENTS" -> Map("PROPS" -> "'{}'"))

  /** Soft-delete: rows whose o_orderstatus is 'F' are treated as deleted;
    * only tables carrying the column (orders) get the WHERE. */
  val softDelete: (String, String) = "o_orderstatus" -> "<> 'F'"

  val config: BuilderConfig = BuilderConfig(
    schemaConfig = ListMap(AppDest -> ListMap(
      RawSchema -> SourceSchemaOptions(softDelete = Some(softDelete)))),
    redactions = redactions,
    bannedColumnNames = Nil,
    unmanagedTables = Nil,
    downstreamSourcesAllowList = None)

  private val cache = new ConcurrentHashMap[String, BuildResult]()

  /** Build (once per schema dir per JVM) and register the LMS trifecta views
    * over `sfDir`. Idempotent; artifacts land under target/graft-out. */
  def build(spark: SparkSession, sfDir: String): BuildResult =
    cache.computeIfAbsent(sfDir, { _ =>
      val sub = sfDir.replaceAll("[^A-Za-z0-9_.-]", "_")
      try
        new SchemaBuilderEngine(spark, config, (_, _) => sfDir, s"target/graft-out/$sub")
          .buildApp(AppDest, config.schemaConfig(AppDest))
      catch {
        // cwd may not be the repo (driver-run): fall back to a temp dir so
        // artifact IO never takes the registered views down with it
        case _: java.io.IOException | _: java.nio.file.FileSystemException =>
          val tmp = java.nio.file.Files.createTempDirectory("graft-out").toString
          new SchemaBuilderEngine(spark, config, (_, _) => sfDir, tmp)
            .buildApp(AppDest, config.schemaConfig(AppDest))
      }
    })
}
