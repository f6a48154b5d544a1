package graft.model

import scala.collection.mutable

/** An application (destination schema) whose trifecta is being generated.
  *
  * Port of `App` (/root/reference/dbt_schema_builder/app.py:10-229):
  * accumulates the new raw-schema doc and downstream-sources doc as
  * relations are processed, preserving prior-run entries passed in.
  */
final class App(
    val rawSchemas: Seq[RawSchema],
    val app: String,
    val appPath: String,
    val designFilePath: String,
    val currentRawSources: Option[SchemaDoc],
    val currentDownstreamSources: Option[SchemaDoc],
    val database: String,
    val noPii: Boolean = false,
    val piiOnly: Boolean = false) {

  require(!(noPii && piiOnly),
    "Cannot specify both no_pii and pii_only flags as true")

  val safeDownstreamSourceName: String = app
  val piiDownstreamSourceName: String = s"${app}_PII"
  val addPii: Boolean = !noPii
  val addSafe: Boolean = !piiOnly

  /** Fresh doc per run so dropped tables disappear (app.py:45-53). */
  val newSchema: SchemaDoc = SchemaDoc(
    version = 2,
    sources = rawSchemas.map(rs =>
      SourceSection(rs.schemaName, database, mutable.Buffer.empty)).toBuffer,
    models = mutable.Buffer.empty)

  /** Seeded from a deep copy of the prior downstream doc with the SAFE/PII
    * sections' tables reset (app.py:60-95). */
  val newDownstreamSources: SchemaDoc = {
    val copied: mutable.Buffer[SourceSection] =
      currentDownstreamSources.map(_.sources.map(s =>
        SourceSection(s.name, s.database,
          s.tables.map(t => t.clone().asInstanceOf[Docs.TableEntry]))))
        .getOrElse(mutable.Buffer.empty)
    val byName = copied.map(_.name)
    if (!piiOnly) {
      byName.indexOf(safeDownstreamSourceName) match {
        case -1 => copied += SourceSection(safeDownstreamSourceName, database, mutable.Buffer.empty)
        case i => copied(i).tables.clear()
      }
    }
    if (!noPii) {
      byName.indexOf(piiDownstreamSourceName) match {
        case -1 => copied += SourceSection(piiDownstreamSourceName, database, mutable.Buffer.empty)
        case i => copied(i).tables.clear()
      }
    }
    SchemaDoc(2, copied, mutable.Buffer.empty)
  }

  override def toString: String = app

  /** Duplicate `SCHEMA.TABLE` detection across downstream sources
    * (app.py:103-123). Non-fatal: caller logs. */
  def checkDownstreamSourcesForDupes(): Seq[String] = {
    val seen = mutable.Set.empty[String]
    val dupes = mutable.Buffer.empty[String]
    newDownstreamSources.sources.foreach { source =>
      source.tables.foreach { t =>
        val q = source.name + "." + t.get("name").map(String.valueOf).getOrElse("")
        if (seen.contains(q)) dupes += q else seen += q
      }
    }
    dupes.toSeq
  }

  /** Append preserved-or-fresh raw table entry to its schema section
    * (app.py:125-144). */
  def addSourceToNewSchema(currentRawSource: Option[Docs.TableEntry],
      relation: Relation, rawSchema: RawSchema): Unit = {
    val idx = newSchema.sources.indexWhere(_.name == rawSchema.schemaName)
    newSchema.sources(idx).database = rawSchema.database
    newSchema.sources(idx).tables +=
      currentRawSource.getOrElse(Docs.tableEntry("name" -> relation.sourceRelationName))
  }

  /** Append to SAFE/PII downstream sections unless the relation generates no
    * view (unmanaged w/o manual model) or is allow-list-excluded
    * (app.py:146-194). */
  def addTableToDownstreamSources(relation: Relation,
      currentSafeSource: Option[Docs.TableEntry],
      currentPiiSource: Option[Docs.TableEntry]): Unit = {
    if (relation.isUnmanaged && !relation.manualSafeModelExists) return
    if (relation.excludedFromDownstreamSources) return
    newDownstreamSources.sources.foreach { source =>
      if (addSafe && source.name == safeDownstreamSourceName)
        source.tables += currentSafeSource.getOrElse(Docs.tableEntry(
          "name" -> relation.relation, "description" -> Relation.DefaultDescription))
      else if (addPii && source.name == piiDownstreamSourceName)
        source.tables += currentPiiSource.getOrElse(Docs.tableEntry(
          "name" -> relation.relation, "description" -> Relation.DefaultDescription))
    }
  }

  /** Register the generated view models in the new schema (app.py:196-208). */
  def updateTrifectaModels(relation: Relation): Unit = {
    val names =
      if (noPii) Seq(relation.newSafeRelationName)
      else if (piiOnly) Seq(relation.newPiiRelationName)
      else Seq(relation.newPiiRelationName, relation.newSafeRelationName)
    names.foreach(n => addModelToNewSchema(n, relation.metaData))
  }

  /** app.py:210-220 */
  def addModelToNewSchema(newRelationName: String, columns: Seq[String]): Unit =
    newSchema.models += ModelSection(newRelationName, columns)
}
