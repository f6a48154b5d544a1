package graft

import java.nio.file.{Files, Paths}
import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{BuilderConfig, SourceSchemaOptions}
import graft.engine.SchemaBuilderEngine
import graft.generate.YamlDocs

/** End-to-end engine behavior over real Parquet (sf0.001) + the trifecta
  * column-invariant property (README.rst:22-23: all three schemas expose the
  * same columns in the same order). */
class EngineSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def engine(cfg: BuilderConfig, out: String) =
    new SchemaBuilderEngine(spark, cfg, (_, _) => dir, out)

  private val baseCfg = BuilderConfig(
    schemaConfig = ListMap("PROD.T1" -> ListMap(
      "RAW.TPCH" -> SourceSchemaOptions(
        include = Seq("customer", "orders", "region"),
        softDelete = Some("o_orderstatus" -> "<> 'F'")))),
    redactions = Map("T1.CUSTOMER" -> Map("C_NAME" -> "'<redacted>'")),
    bannedColumnNames = Nil,
    unmanagedTables = Nil,
    downstreamSourcesAllowList = None)

  test("buildApp registers queryable trifecta views with redaction + soft delete") {
    val result = engine(baseCfg, "target/engine-spec-1")
      .buildApp("PROD.T1", baseCfg.schemaConfig("PROD.T1"))
    assert(result.relations.map(_.sourceRelationName).sorted ==
      Seq("customer", "orders", "region"))

    val safeCust = spark.table("T1_customer")
    assert(safeCust.select("c_name").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("<redacted>"))
    val piiCust = spark.table("T1_PII_customer")
    assert(piiCust.select("c_name").distinct().count() > 1)

    // soft delete applied to both views of orders only
    import org.apache.spark.sql.functions.col
    assert(spark.table("T1_orders").filter(col("o_orderstatus") === "F").count() == 0)
    assert(spark.table("T1_PII_orders").filter(col("o_orderstatus") === "F").count() == 0)
  }

  test("generated YAML docs round-trip and orphan SQL is cleaned") {
    val out = "target/engine-spec-2"
    val eng = engine(baseCfg, out)
    eng.buildApp("PROD.T1", baseCfg.schemaConfig("PROD.T1"))
    val design = Paths.get(out, "PROD", "T1", "T1.yml")
    assert(Files.exists(design))
    val doc = YamlDocs.read(design).get
    assert(doc.sources.head.name == "TPCH")
    assert(doc.models.map(_.name).toSet ==
      Set("T1_customer", "T1_PII_customer", "T1_orders", "T1_PII_orders",
        "T1_region", "T1_PII_region"))

    // plant an orphan; a rebuild must remove it
    val orphan = Paths.get(out, "PROD", "T1", "T1", "T1_ghost.sql")
    Files.writeString(orphan, "SELECT 1")
    eng.buildApp("PROD.T1", baseCfg.schemaConfig("PROD.T1"))
    assert(!Files.exists(orphan))
    assert(Files.exists(Paths.get(out, "PROD", "T1", "T1", "T1_customer.sql")))
  }

  test("prior hand-edits survive regeneration") {
    val out = "target/engine-spec-3"
    val eng = engine(baseCfg, out)
    eng.buildApp("PROD.T1", baseCfg.schemaConfig("PROD.T1"))
    // hand-edit the downstream doc
    val dsPath = Paths.get(out, "downstream", "PROD", "T1.yml")
    val doc = YamlDocs.read(dsPath).get
    doc.sources.find(_.name == "T1").get.tables
      .find(_("name") == "customer").get("description") = "hand edit"
    YamlDocs.write(dsPath, doc)
    eng.buildApp("PROD.T1", baseCfg.schemaConfig("PROD.T1"))
    val again = YamlDocs.read(dsPath).get
    assert(again.sources.find(_.name == "T1").get.tables
      .find(_("name") == "customer").get("description") == "hand edit")
  }

  test("banned columns never reach any artifact") {
    val cfg = baseCfg.copy(bannedColumnNames = Seq("c_name", "c_acctbal"))
    engine(cfg, "target/engine-spec-4")
      .buildApp("PROD.T1", cfg.schemaConfig("PROD.T1"))
    assert(!spark.table("T1_customer").columns.contains("c_name"))
    assert(!spark.table("T1_PII_customer").columns.contains("c_acctbal"))
  }

  test("invariant: SAFE, PII and RAW expose identical column lists (every table, redacted or not)") {
    val tables = Seq("customer", "orders", "lineitem", "part", "supplier",
      "nation", "region", "events", "documents", "embeddings")
    for (table <- tables; redactFirst <- Seq(true, false)) {
      val raw = Tables.load(spark, dir, table)
      val redactions =
        if (redactFirst)
          Map(s"PT.${table.toUpperCase}" -> Map(raw.columns.head.toUpperCase -> "'x'"))
        else Map.empty[String, Map[String, String]]
      val rel = graft.model.Relation(table, raw.columns.toSeq, "PT", "target/pt",
        graft.config.ReservedKeywords.all, Nil, redactions, None, None)
      val schema = graft.model.RawSchema("RAW", "TPCH", Nil, Nil, None, None)
      val safe = graft.generate.Trifecta.safeView(raw, rel, schema)
      val pii = graft.generate.Trifecta.piiView(raw, rel, schema)
      assert(safe.columns.toSeq == raw.columns.toSeq, s"SAFE columns differ for $table")
      assert(pii.columns.toSeq == raw.columns.toSeq, s"PII columns differ for $table")
    }
  }
}
