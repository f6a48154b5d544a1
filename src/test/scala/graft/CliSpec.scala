package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.SchemaBuilderCli

/** CLI arg parsing + end-to-end run over a real project dir. */
class CliSpec extends AnyFunSuite {

  private def writeProject(): String = {
    val dir = Files.createTempDirectory(Paths.get("target"), "cli-project").toString
    Files.writeString(Paths.get(dir, "schema_config.yml"),
      """PROD.CLIAPP:
        |  RAW.TPCH:
        |    INCLUDE:
        |      - customer
        |      - region
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "redactions.yml"),
      "CLIAPP.CUSTOMER:\n  C_NAME: \"'<redacted>'\"\n")
    Files.writeString(Paths.get(dir, "schema_dirs.yml"),
      s"RAW.TPCH: ${TestSpark.sfDir}\n")
    dir
  }

  test("missing subcommand / bad flags rejected") {
    intercept[IllegalArgumentException](SchemaBuilderCli.parseArgs(Array.empty))
    intercept[IllegalArgumentException](
      SchemaBuilderCli.parseArgs(Array("build", "--bogus")))
    val dir = writeProject()
    intercept[IllegalArgumentException](SchemaBuilderCli.parseArgs(
      Array("build", "--project-dir", dir, "--destination-project", "target/cli-out",
        "--nopii", "--piionly")))
  }

  test("dbt runtime flags are accepted and ignored for drop-in parity") {
    val dir = writeProject()
    val cli = SchemaBuilderCli.parseArgs(Array("build",
      "--project-dir", dir, "--destination-project", "target/cli-out",
      "--profile", "warehouse", "--profiles-dir", "/tmp/profiles",
      "--target", "dev", "--threads", "4", "--nopii"))
    assert(cli.projectDir == dir)
    assert(cli.noPii)
    // unknown flags still rejected — the pass-through is a fixed allow-list
    intercept[IllegalArgumentException](SchemaBuilderCli.parseArgs(Array("build",
      "--project-dir", dir, "--destination-project", "x", "--fan-out", "9")))
    // a value-less ignored flag fails loudly (argparse parity) instead of
    // swallowing the next option
    val e = intercept[IllegalArgumentException](SchemaBuilderCli.parseArgs(
      Array("build", "--project-dir", dir, "--destination-project", "x",
        "--profile", "--nopii")))
    assert(e.getMessage.contains("--profile expects one argument"))
    intercept[IllegalArgumentException](SchemaBuilderCli.parseArgs(
      Array("build", "--project-dir", dir, "--destination-project", "x",
        "--threads")))
  }

  test("project dir must contain schema_config.yml") {
    val empty = Files.createTempDirectory(Paths.get("target"), "cli-empty").toString
    val e = intercept[IllegalArgumentException](SchemaBuilderCli.parseArgs(
      Array("build", "--project-dir", empty, "--destination-project", "x")))
    assert(e.getMessage.contains("not a valid project directory"))
  }

  test("build runs end-to-end from config files") {
    val dir = writeProject()
    val cli = SchemaBuilderCli.parseArgs(Array("build",
      "--project-dir", dir, "--destination-project", "target/cli-out"))
    val results = SchemaBuilderCli.run(TestSpark.spark, cli)
    assert(results.size == 1)
    assert(results.head.relations.map(_.sourceRelationName).sorted == Seq("customer", "region"))
    val safe = TestSpark.spark.table("CLIAPP_customer")
    assert(safe.select("c_name").distinct().collect().map(_.getString(0)).toSeq == Seq("<redacted>"))
    assert(Files.exists(Paths.get("target/cli-out", "PROD", "CLIAPP", "CLIAPP.yml")))
  }
}
