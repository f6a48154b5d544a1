package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{Configs, InvalidConfigurationException}

/** Ports of the reference's config-validation tests
  * (/root/reference/tests/test_builder.py:16-175). */
class ConfigSpec extends AnyFunSuite {

  private def validConfig: Map[String, Any] = Configs.parseYamlMap(
    """DB_1.APP_1:
      |  DB_1.RAW_SCHEMA_1:
      |    INCLUDE:
      |      - TABLE_1
      |      - TABLE_2
      |  DB_1.RAW_SCHEMA_2:
      |    EXCLUDE:
      |      - TABLE_1
      |    SOFT_DELETE:
      |      DELETED_AT: IS NOT NULL
      |DB_1.APP_2:
      |  DB_1.RAW_SCHEMA_1: {}
      |""".stripMargin)

  test("valid schema config passes") {
    assert(Configs.validateSchemaConfig(validConfig))
  }

  test("INCLUDE and EXCLUDE together is rejected") {
    val cfg = Configs.parseYamlMap(
      """DB_1.APP_1:
        |  DB_1.RAW_SCHEMA_1:
        |    INCLUDE: [A]
        |    EXCLUDE: [B]
        |""".stripMargin)
    val e = intercept[InvalidConfigurationException](Configs.validateSchemaConfig(cfg))
    assert(e.getMessage.contains("has both an EXCLUDE and INCUDE section"))
  }

  test("SOFT_DELETE must be a mapping") {
    val cfg = Configs.parseYamlMap(
      """DB_1.APP_1:
        |  DB_1.RAW_SCHEMA_1:
        |    SOFT_DELETE: [DELETED_AT]
        |""".stripMargin)
    val e = intercept[InvalidConfigurationException](Configs.validateSchemaConfig(cfg))
    assert(e.getMessage.contains("SOFT_DELETE"))
  }

  test("SOFT_DELETE with two keys is rejected") {
    val cfg = Configs.parseYamlMap(
      """DB_1.APP_1:
        |  DB_1.RAW_SCHEMA_1:
        |    SOFT_DELETE:
        |      A: IS NULL
        |      B: IS NULL
        |""".stripMargin)
    val e = intercept[InvalidConfigurationException](Configs.validateSchemaConfig(cfg))
    assert(e.getMessage.contains("must only have one key/value pair"))
  }

  test("destination schema must be DB.SCHEMA") {
    val cfg = Configs.parseYamlMap("BAD_DESTINATION:\n  DB_1.RAW: {}\n")
    val e = intercept[InvalidConfigurationException](Configs.validateSchemaConfig(cfg))
    assert(e.getMessage.contains("Invalid destination schema path"))
  }

  test("source schema must be DB.SCHEMA") {
    val cfg = Configs.parseYamlMap("DB_1.APP_1:\n  BAD_SOURCE: {}\n")
    val e = intercept[InvalidConfigurationException](Configs.validateSchemaConfig(cfg))
    assert(e.getMessage.contains("Invalid source schema path"))
  }

  test("unknown keys are rejected") {
    val cfg = Configs.parseYamlMap(
      "DB_1.APP_1:\n  DB_1.RAW:\n    FROBNICATE: [X]\n")
    val e = intercept[InvalidConfigurationException](Configs.validateSchemaConfig(cfg))
    assert(e.getMessage.contains("is not a valid key"))
  }

  test("unmanaged tables: valid formats pass") {
    assert(Configs.validateUnmanagedTables(
      Seq("SCHEMA_1.TABLE_1", "SCHEMA_1.TABLE_.*", "SCHEMA_2.TABLE_[0-9]")))
  }

  test("unmanaged tables: missing dot rejected") {
    val e = intercept[InvalidConfigurationException](
      Configs.validateUnmanagedTables(Seq("BAD_SCHEMA")))
    assert(e.getMessage.contains("is not formatted correctly"))
  }

  test("unmanaged tables: invalid regex rejected") {
    val e = intercept[InvalidConfigurationException](
      Configs.validateUnmanagedTables(Seq("SCHEMA_1.BAD_REGEX[")))
    assert(e.getMessage.contains("invalid regular expression"))
  }

  test("allow list: empty list rejected, absent allowed") {
    assert(Configs.validateAllowList(None).isEmpty)
    intercept[IllegalArgumentException](
      Configs.validateAllowList(Some(new java.util.ArrayList[String]())))
  }
}
