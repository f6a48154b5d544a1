package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.config.ReservedKeywords
import graft.generate.Trifecta
import graft.model.{Docs, RawSchema, Relation, SchemaDoc, SourceSection}

/** Ports of /root/reference/tests/test_relation.py. */
class RelationSpec extends AnyFunSuite {

  private def mkRelation(
      name: String = "THIS_TABLE",
      cols: Seq[String] = Seq("COLUMN_1", "COLUMN_2"),
      keywords: Set[String] = Set("START", "END"),
      unmanaged: Seq[String] = Nil,
      redactions: Map[String, Map[String, String]] = Map.empty,
      allowList: Option[Seq[String]] = None,
      prefix: Option[String] = None) =
    Relation(name, cols, "LMS", "target/test-app-path", keywords, unmanaged,
      redactions, allowList, prefix)

  test("keyword table name is aliased with underscore") {
    val r = mkRelation(name = "START")
    assert(r.relation == "_START")
    assert(r.newSafeRelationName == "LMS__START")
    assert(r.newPiiRelationName == "LMS_PII__START")
  }

  test("prefix wins over keyword underscore") {
    val r = mkRelation(name = "START", prefix = Some("TESTPREFIX"))
    assert(r.relation == "TESTPREFIX_START")
  }

  test("non-keyword name passes through") {
    val r = mkRelation()
    assert(r.relation == "THIS_TABLE")
    assert(r.getModelName("SAFE") == "LMS_THIS_TABLE")
    assert(r.getModelName("PII") == "LMS_PII_THIS_TABLE")
  }

  test("keyword columns are quoted and uppercased in prep_meta_data") {
    val r = mkRelation(cols = Seq("table", "schema", "normal"),
      keywords = ReservedKeywords.all)
    val prepped = r.prepMetaData
    assert(prepped.columns == Seq("\"TABLE\"", "\"SCHEMA\"", "NORMAL"))
    assert(prepped.description == "TODO: Replace me")
  }

  test("unmanaged match is anchored at the end") {
    assert(mkRelation(unmanaged = Seq("LMS.THIS_TABLE")).isUnmanaged)
    assert(mkRelation(unmanaged = Seq("LMS.THIS_.*")).isUnmanaged)
    assert(!mkRelation(unmanaged = Seq("LMS.THIS")).isUnmanaged)
    assert(!mkRelation(unmanaged = Seq("OTHER.THIS_TABLE")).isUnmanaged)
  }

  test("allow-list exclusion") {
    assert(!mkRelation(allowList = None).excludedFromDownstreamSources)
    assert(!mkRelation(allowList = Some(Seq("LMS.THIS_TABLE"))).excludedFromDownstreamSources)
    assert(mkRelation(allowList = Some(Seq("LMS.OTHER"))).excludedFromDownstreamSources)
  }

  private def rawSchema(softDelete: Option[(String, String)] = None) =
    RawSchema("RAW", "TPCH", Nil, Nil, softDelete.map(_._1), softDelete.map(_._2))

  test("rendered SAFE SQL redacts and aliases; includes soft-delete WHERE only when column present") {
    val r = mkRelation(cols = Seq("COLUMN_1", "SOFT_DELETE_COLUMN"),
      redactions = Map("LMS.THIS_TABLE" -> Map("COLUMN_1" -> "'<redacted>'")))
    val schema = rawSchema(Some("SOFT_DELETE_COLUMN" -> "IS NULL"))
    val sql = Trifecta.renderSql("LMS", "SAFE", r.prepMetaData, schema, r.redactions)
    assert(sql.contains("'<redacted>' as COLUMN_1"))
    assert(sql.contains("WHERE SOFT_DELETE_COLUMN IS NULL"))
    assert(!sql.contains("PII"))

    val noSd = Trifecta.renderSql("LMS", "SAFE",
      mkRelation(cols = Seq("COLUMN_1")).prepMetaData, schema, Map.empty)
    assert(!noSd.contains("WHERE"))
  }

  test("redaction of a reserved-keyword column matches on the quoted name (reference parity)") {
    // the reference's template looks up redactions by the *prepped* column
    // name, which for keyword columns includes the quotes — a redaction
    // configured under the bare name does not match (model_sql_safe.tpl:7-9)
    val quoted = mkRelation(cols = Seq("select", "normal"),
      keywords = ReservedKeywords.all,
      redactions = Map("LMS.THIS_TABLE" -> Map("\"SELECT\"" -> "'x'")))
    val sqlQuoted = Trifecta.renderSql("LMS", "SAFE", quoted.prepMetaData,
      rawSchema(), quoted.redactions)
    assert(sqlQuoted.contains("'x' as \"SELECT\""))

    val bare = mkRelation(cols = Seq("select", "normal"),
      keywords = ReservedKeywords.all,
      redactions = Map("LMS.THIS_TABLE" -> Map("SELECT" -> "'x'")))
    val sqlBare = Trifecta.renderSql("LMS", "SAFE", bare.prepMetaData,
      rawSchema(), bare.redactions)
    assert(!sqlBare.contains("'x'"))
  }

  test("rendered PII SQL passes columns through unredacted") {
    val r = mkRelation(cols = Seq("COLUMN_1", "COLUMN_2"),
      redactions = Map("LMS.THIS_TABLE" -> Map("COLUMN_1" -> "'<redacted>'")))
    val sql = Trifecta.renderSql("LMS", "PII", r.prepMetaData, rawSchema(), r.redactions)
    assert(sql.contains("COLUMN_1"))
    assert(!sql.contains("redacted"))
    assert(sql.contains("schema='LMS_PII'"))
  }

  private def downstreamDoc(tableName: String): SchemaDoc = {
    val t: Docs.TableEntry = Docs.tableEntry(
      "name" -> tableName, "description" -> "keep me",
      "freshness" -> Map("warn_after" -> Map("count" -> 1, "period" -> "day")))
    SchemaDoc(2,
      mutable.Buffer(
        SourceSection("LMS", "PROD", mutable.Buffer(t)),
        SourceSection("LMS_PII", "PROD",
          mutable.Buffer(Docs.tableEntry("name" -> tableName, "description" -> "pii keep")))),
      mutable.Buffer.empty)
  }

  test("find_in_current_sources preserves hand-edits") {
    val r = mkRelation()
    val (raw, safe, pii) = r.findInCurrentSources(None, Some(downstreamDoc("THIS_TABLE")))
    assert(raw.isEmpty)
    assert(safe.exists(_("description") == "keep me"))
    assert(pii.exists(_("description") == "pii keep"))
  }

  test("prefix not yet applied: prior entry renamed in place") {
    val doc = downstreamDoc("THIS_TABLE")
    val r = mkRelation(prefix = Some("PFX"))
    val (_, safe, pii) = r.findInCurrentSources(None, Some(doc))
    assert(safe.exists(_("name") == "PFX_THIS_TABLE"))
    assert(pii.exists(_("name") == "PFX_THIS_TABLE"))
    // prior doc mutated, as in the reference
    assert(doc.sources.head.tables.head("name") == "PFX_THIS_TABLE")
  }

  test("prefix already applied: entry found under prefixed name") {
    val doc = downstreamDoc("PFX_THIS_TABLE")
    val r = mkRelation(prefix = Some("PFX"))
    val (_, safe, _) = r.findInCurrentSources(None, Some(doc))
    assert(safe.exists(_("name") == "PFX_THIS_TABLE"))
    assert(safe.exists(_("description") == "keep me"))
  }
}
