package graft.model

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** One table entry inside a sources/models YAML doc. Insertion-ordered and
  * mutable so that hand-edits (description, freshness, tests, ...) read from
  * a prior run survive regeneration, matching the reference's dict-based
  * preservation semantics (relation.py:81-138). */
object Docs {
  type TableEntry = mutable.LinkedHashMap[String, Any]
  def tableEntry(kvs: (String, Any)*): TableEntry = {
    val m = new mutable.LinkedHashMap[String, Any]
    kvs.foreach { case (k, v) => m += (k -> v) }
    m
  }
}

/** A relation (table/view) of a raw schema, plus its derived trifecta names.
  *
  * Port of `Relation` (/root/reference/dbt_schema_builder/relation.py:20-288).
  *
  * @param sourceRelationName table name as found in the raw schema catalog
  * @param metaData           ordered column names (catalog order)
  * @param app                destination application schema name
  * @param appPath            directory receiving generated model SQL
  */
final case class Relation(
    sourceRelationName: String,
    metaData: Seq[String],
    app: String,
    appPath: String,
    keywords: Set[String],
    unmanagedTables: Seq[String],
    redactions: Map[String, Map[String, String]],
    downstreamSourcesAllowList: Option[Seq[String]],
    prefix: Option[String] = None) {

  /** Keyword-collision / prefix alias (relation.py:48-57): reserved keyword
    * and no prefix -> `_NAME`; prefix -> `PREFIX_NAME`; else unchanged. */
  val relation: String = prefix match {
    case None if keywords.contains(sourceRelationName) => s"_$sourceRelationName"
    case Some(p) => s"${p}_$sourceRelationName"
    case None => sourceRelationName
  }

  /** Trifecta names (relation.py:34-35). */
  val newSafeRelationName: String = s"${app}_$relation"
  val newPiiRelationName: String = s"${app}_PII_$relation"

  override def toString: String = sourceRelationName

  /** Uppercase + reserved-word quoting of columns, packaged for rendering
    * (relation.py:59-79). */
  def prepMetaData: RelationDict = {
    val cols = metaData.map { c =>
      val up = c.toUpperCase
      if (keywords.contains(up)) "\"" + up + "\"" else up
    }
    RelationDict(sourceRelationName, relation, Relation.DefaultDescription, cols)
  }

  /** Anchored-suffix regex match of `APP.alias` against the unmanaged list
    * (relation.py:140-154). Unmanaged relations get no generated model. */
  def isUnmanaged: Boolean = {
    val relationName = s"$app.$relation"
    unmanagedTables.exists { entry =>
      (entry + "$").r.findFirstIn(relationName).isDefined
    }
  }

  /** Excluded from downstream sources iff an allow-list exists and
    * `APP.alias` is not on it (relation.py:164-175). */
  def excludedFromDownstreamSources: Boolean =
    downstreamSourcesAllowList.exists(l => !l.contains(s"$app.$relation"))

  /** Upstream model name (file stem / ref() target) (relation.py:206-215). */
  def getModelName(viewType: String): String =
    if (viewType == "SAFE") s"${app}_$relation" else s"${app}_${viewType}_$relation"

  /** True if a hand-written model exists in `{APP}_MANUAL/`
    * (relation.py:156-162, 177-204). */
  def manualSafeModelExists: Boolean = manualModelExists("SAFE")

  def manualModelExists(viewType: String): Boolean = {
    val manualDir = Paths.get(appPath, s"${app}_MANUAL")
    if (Files.isDirectory(manualDir)) {
      if (!Relation.dirIsFlat(manualDir))
        throw new RuntimeException(
          s"""MANUAL directory is not "flat", i.e. it contains subdirectories: $manualDir""")
      Files.exists(manualDir.resolve(s"${getModelName(viewType)}.sql"))
    } else false
  }

  /** Preservation lookup into prior-run YAML state (relation.py:81-138).
    *
    * Returns (raw, safeDownstream, piiDownstream) table entries from the
    * previously-written docs, if present, so hand-edits survive. The three
    * prefix cases are ported exactly, including the in-place rename of the
    * prior entry when a prefix is newly introduced (relation.py:110, :122).
    */
  def findInCurrentSources(
      currentRawSources: Option[SchemaDoc],
      currentDownstreamSources: Option[SchemaDoc])
      : (Option[Docs.TableEntry], Option[Docs.TableEntry], Option[Docs.TableEntry]) = {
    if (currentRawSources.isEmpty && currentDownstreamSources.isEmpty)
      return (None, None, None)

    var raw: Option[Docs.TableEntry] = None
    var safe: Option[Docs.TableEntry] = None
    var pii: Option[Docs.TableEntry] = None

    currentRawSources.foreach { doc =>
      doc.sources.foreach { source =>
        source.tables.find(t => t != null && t.get("name").contains(sourceRelationName))
          // later sources overwrite: the LAST source's entry wins when the
          // same table name exists in multiple raw schemas (relation.py:97-102)
          .foreach { t => raw = Some(t) }
      }
    }

    currentDownstreamSources.foreach { doc =>
      val it = doc.sources.iterator
      var done = false
      while (it.hasNext && !done) {
        val source = it.next()
        if (source.name == app) {
          source.tables.foreach { t =>
            if (t != null) {
              val name = t.get("name").map(String.valueOf)
              if (prefix.isDefined && name.contains(sourceRelationName)) {
                // prefix configured but prior doc predates it: rename in place
                t("name") = prefix.get + "_" + sourceRelationName
                safe = Some(t)
              } else if (name.contains(sourceRelationName)) {
                safe = Some(t)
              } else if (prefix.isDefined && name.contains(prefix.get + "_" + sourceRelationName)) {
                safe = Some(t)
              }
            }
          }
        } else if (source.name == s"${app}_PII") {
          source.tables.foreach { t =>
            if (t != null) {
              val name = t.get("name").map(String.valueOf)
              if (prefix.isDefined && name.contains(sourceRelationName)) {
                t("name") = prefix.get + "_" + sourceRelationName
                pii = Some(t)
              } else if (name.contains(sourceRelationName)) {
                pii = Some(t)
              } else if (prefix.isDefined && name.contains(prefix.get + "_" + sourceRelationName)) {
                pii = Some(t)
              }
            }
          }
        }
        if (safe.isDefined && pii.isDefined) done = true
      }
    }
    (raw, safe, pii)
  }
}

object Relation {
  /** relation.py:11 / builder.py:31 */
  val DefaultDescription = "TODO: Replace me"

  def dirIsFlat(path: Path): Boolean =
    !Files.list(path).iterator().asScala.exists(Files.isDirectory(_))
}

/** Output of prep_meta_data (relation.py:71-77): what the SQL templates see. */
final case class RelationDict(
    name: String,
    alias: String,
    description: String,
    columns: Seq[String])

/** In-memory form of a sources/models YAML document (the reference passes
  * raw dicts; we give the two-level structure names but keep table entries
  * as ordered maps for preservation). */
final case class SchemaDoc(
    version: Int,
    sources: mutable.Buffer[SourceSection],
    models: mutable.Buffer[ModelSection])

final case class SourceSection(
    name: String,
    var database: String,
    tables: mutable.Buffer[Docs.TableEntry])

final case class ModelSection(name: String, columns: Seq[String])
