package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.Configs
import graft.engine.SchemaBuilderEngine

/** Command-line entry point — port of the reference CLI
  * (/root/reference/dbt_schema_builder/schema_builder.py:16-123):
  * one `build` subcommand; `--nopii`/`--piionly` mutually exclusive;
  * `--destination-project` required; both project dirs validated before
  * work starts.
  *
  * The warehouse connection of the reference becomes a lake root here:
  * raw schema `DB.SCHEMA` resolves to `<--source-root>/DB/SCHEMA` (a
  * directory of `<table>.parquet`), overridable per schema via
  * `schema_dirs.yml` (`DB.SCHEMA: /path`) in the project dir.
  *
  * Usage:
  *   build --project-dir P --destination-project D [--source-root R]
  *         [--nopii | --piionly]
  */
object SchemaBuilderCli {

  def main(args: Array[String]): Unit = {
    val parsed = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("schema-builder")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val results = run(spark, parsed)
      results.foreach { r =>
        println(s"[schema-builder] app=${r.app.app} relations=${r.relations.size} " +
          s"safe_views=${r.safeViews.size} pii_views=${r.piiViews.size} " +
          s"dupes=${r.dupes.size}")
        r.dupes.foreach(d => System.err.println(s"[schema-builder] duplicate downstream source: $d"))
      }
    } finally spark.stop()
  }

  final case class CliArgs(
      projectDir: String,
      destinationProject: String,
      sourceRoot: Option[String],
      noPii: Boolean,
      piiOnly: Boolean)

  def parseArgs(args: Array[String]): CliArgs = {
    if (args.isEmpty || args(0) != "build")
      throw new IllegalArgumentException("usage: build --project-dir P --destination-project D [--source-root R] [--nopii|--piionly]")
    var projectDir: Option[String] = None
    var destination: Option[String] = None
    var sourceRoot: Option[String] = None
    var noPii = false
    var piiOnly = false
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--project-dir" => projectDir = Some(args(i + 1)); i += 2
        case "--destination-project" => destination = Some(args(i + 1)); i += 2
        case "--source-root" => sourceRoot = Some(args(i + 1)); i += 2
        case "--nopii" => noPii = true; i += 1
        case "--piionly" => piiOnly = true; i += 1
        // dbt runtime flags (schema_builder.py:37-63) — accepted for
        // drop-in CLI parity, ignored: they configure the dbt/warehouse
        // adapter that a SparkSession replaces (profiles resolve
        // connections, --threads sizes the dbt scheduler). Each takes a
        // value in the reference, so consume one here too — and like
        // argparse, fail loudly when the value is missing (a bare flag
        // would otherwise swallow the NEXT option, silently dropping
        // e.g. a following --nopii).
        case f @ ("--profile" | "--profiles-dir" | "--target" | "--threads") =>
          if (i + 1 >= args.length || args(i + 1).startsWith("--"))
            throw new IllegalArgumentException(s"$f expects one argument")
          i += 2
        case other => throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    // mutual exclusion, as at schema_builder.py:65-80
    if (noPii && piiOnly)
      throw new IllegalArgumentException(
        "piionly and nopii are mutually exlusive and both have been specified")
    val pd = projectDir.getOrElse(throw new IllegalArgumentException("--project-dir is required"))
    val dest = destination.getOrElse(throw new IllegalArgumentException("--destination-project is required"))
    // project validation, as at builder.py:597-613 (dbt_project.yml there,
    // schema_config.yml here)
    if (!Files.exists(Paths.get(pd, "schema_config.yml")))
      throw new IllegalArgumentException(
        s"$pd does not contain a schema_config.yml file, it is not a valid project directory")
    CliArgs(pd, dest, sourceRoot, noPii, piiOnly)
  }

  def run(spark: SparkSession, cli: CliArgs): Seq[graft.engine.BuildResult] = {
    val config = Configs.loadFromDir(cli.projectDir)
    val overrides: Map[String, String] =
      Configs.loadYamlMap(Paths.get(cli.projectDir, "schema_dirs.yml"))
        .getOrElse(Map.empty)
        .map { case (k, v) => k -> String.valueOf(v) }
    val root = cli.sourceRoot.getOrElse(cli.projectDir)
    val resolve = (db: String, schema: String) =>
      overrides.getOrElse(s"$db.$schema", s"$root/$db/$schema")
    new SchemaBuilderEngine(spark, config, resolve, cli.destinationProject,
      cli.noPii, cli.piiOnly).run()
  }
}
