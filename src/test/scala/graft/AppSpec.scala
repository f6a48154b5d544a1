package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{App, Docs, RawSchema, Relation, SchemaDoc, SourceSection}

/** Ports of /root/reference/tests/test_app.py. */
class AppSpec extends AnyFunSuite {

  private def mkRelation(name: String = "THIS_TABLE", prefix: Option[String] = None) =
    Relation(name, Seq("COLUMN_1", "COLUMN_2"), "LMS", "target/test-app-path",
      Set("START", "END"), Nil, Map.empty, None, prefix)

  private def mkSchema = RawSchema("RAW", "TPCH", Nil, Nil, None, None)

  private def mkApp(currentDownstream: Option[SchemaDoc] = None,
      noPii: Boolean = false, piiOnly: Boolean = false) =
    new App(Seq(mkSchema), "LMS", "target/test-app-path", "target/test-design.yml",
      None, currentDownstream, "PROD", noPii, piiOnly)

  test("new schema accumulates raw source and trifecta models") {
    val app = mkApp()
    val r = mkRelation()
    app.addSourceToNewSchema(None, r, mkSchema)
    app.updateTrifectaModels(r)
    assert(app.newSchema.sources.head.tables.map(_("name")) == mutable.Buffer("THIS_TABLE"))
    assert(app.newSchema.models.map(_.name) ==
      mutable.Buffer("LMS_PII_THIS_TABLE", "LMS_THIS_TABLE"))
    assert(app.newSchema.models.head.columns == Seq("COLUMN_1", "COLUMN_2"))
  }

  test("downstream sources get SAFE and PII entries with default description") {
    val app = mkApp()
    app.addTableToDownstreamSources(mkRelation(), None, None)
    val byName = app.newDownstreamSources.sources.map(s => s.name -> s.tables).toMap
    assert(byName("LMS").head("description") == "TODO: Replace me")
    assert(byName("LMS_PII").head("name") == "THIS_TABLE")
  }

  test("no_pii excludes the PII section; pii_only excludes SAFE") {
    val appNoPii = mkApp(noPii = true)
    assert(appNoPii.newDownstreamSources.sources.map(_.name) == mutable.Buffer("LMS"))
    appNoPii.updateTrifectaModels(mkRelation())
    assert(appNoPii.newSchema.models.map(_.name) == mutable.Buffer("LMS_THIS_TABLE"))

    val appPiiOnly = mkApp(piiOnly = true)
    assert(appPiiOnly.newDownstreamSources.sources.map(_.name) == mutable.Buffer("LMS_PII"))
    appPiiOnly.updateTrifectaModels(mkRelation())
    assert(appPiiOnly.newSchema.models.map(_.name) == mutable.Buffer("LMS_PII_THIS_TABLE"))
  }

  test("both flags rejected") {
    intercept[IllegalArgumentException](mkApp(noPii = true, piiOnly = true))
  }

  test("prior downstream entries preserved; tables reset per run") {
    val prior = SchemaDoc(2, mutable.Buffer(
      SourceSection("LMS", "PROD", mutable.Buffer(
        Docs.tableEntry("name" -> "GONE_TABLE", "description" -> "stale"))),
      SourceSection("OTHER_APP", "PROD", mutable.Buffer(
        Docs.tableEntry("name" -> "FOREIGN", "description" -> "untouched")))),
      mutable.Buffer.empty)
    val app = mkApp(currentDownstream = Some(prior))
    // LMS section reset, OTHER_APP deep-copied untouched, LMS_PII appended
    val byName = app.newDownstreamSources.sources.map(s => s.name -> s.tables).toMap
    assert(byName("LMS").isEmpty)
    assert(byName("OTHER_APP").head("description") == "untouched")
    assert(app.newDownstreamSources.sources.map(_.name) ==
      mutable.Buffer("LMS", "OTHER_APP", "LMS_PII"))
    // deep copy: mutating the new doc must not touch the prior doc
    byName("OTHER_APP").head("description") = "mutated"
    assert(prior.sources(1).tables.head("description") == "untouched")
  }

  test("duplicate downstream tables detected") {
    val app = mkApp()
    val r = mkRelation()
    app.addTableToDownstreamSources(r, None, None)
    app.addTableToDownstreamSources(r, None, None)
    assert(app.checkDownstreamSourcesForDupes() ==
      Seq("LMS.THIS_TABLE", "LMS_PII.THIS_TABLE"))
  }

  test("unmanaged relation without manual model skipped in downstream sources") {
    val app = mkApp()
    val unmanagedRel = Relation("THIS_TABLE", Seq("C1"), "LMS", "target/test-app-path",
      Set.empty, Seq("LMS.THIS_TABLE"), Map.empty, None, None)
    app.addTableToDownstreamSources(unmanagedRel, None, None)
    assert(app.newDownstreamSources.sources.forall(_.tables.isEmpty))
  }
}
