package graft.model

import graft.config.{InvalidConfigurationException, SourceSchemaOptions}

/** A raw source schema backing an application schema.
  *
  * Port of the reference's `Schema`
  * (/root/reference/dbt_schema_builder/schema.py:6-113): holds the
  * include/exclude lists, the optional soft-delete (column, opaque SQL
  * predicate) pair, and an optional table-name prefix. In the Spark engine a
  * "schema" is a directory of Parquet tables (one `<table>.parquet` per
  * relation) or a Spark catalog namespace.
  */
final case class RawSchema(
    database: String,
    schemaName: String,
    exclusionList: Seq[String],
    inclusionList: Seq[String],
    softDeleteColumnName: Option[String],
    softDeleteSqlPredicate: Option[String],
    var relations: Seq[Relation] = Nil,
    prefix: Option[String] = None) {

  validate()

  /** schema.py:27-43 */
  def validate(): Unit = {
    if (softDeleteColumnName.isDefined &&
      (softDeleteSqlPredicate.isEmpty || softDeleteSqlPredicate.exists(p => p == null || p.isEmpty)))
      throw new InvalidConfigurationException(
        s"Schema $schemaName has an invalid SOFT_DELETE configuration. " +
          "SOFT_DELETE must be a single dict with the column name to look for and " +
          "the SQL needed to exclude the soft deleted rows. ")
    if (exclusionList.nonEmpty && inclusionList.nonEmpty)
      throw new InvalidConfigurationException(
        s"Schema $schemaName has both INCLUDE and EXCLUDE sections in its" +
          "sections in its configuration file")
  }

  /** Include/exclude set-membership filter over this schema's relations
    * (schema.py:83-103). */
  def filterRelations(): Seq[Relation] =
    if (exclusionList.nonEmpty && inclusionList.isEmpty)
      relations.filterNot(r => exclusionList.contains(r.sourceRelationName))
    else if (exclusionList.isEmpty && inclusionList.nonEmpty)
      relations.filter(r => inclusionList.contains(r.sourceRelationName))
    else if (exclusionList.isEmpty && inclusionList.isEmpty) relations
    else
      throw new InvalidConfigurationException(
        "This schema has both an INCLUDE and EXCLUDE list.")

  /** `"<COL> <predicate>"` WHERE fragment, or "" when unconfigured
    * (schema.py:105-112). */
  def softDeleteSqlClause: String =
    softDeleteColumnName.fold("")(c => s"$c ${softDeleteSqlPredicate.getOrElse("")}")

  override def toString: String = schemaName
}

object RawSchema {
  /** Schema.from_config (schema.py:45-81). */
  def fromConfig(sourceDatabase: String, schemaName: String,
      opts: SourceSchemaOptions): RawSchema =
    RawSchema(
      database = sourceDatabase,
      schemaName = schemaName,
      exclusionList = opts.exclude,
      inclusionList = opts.include,
      softDeleteColumnName = opts.softDelete.map(_._1),
      softDeleteSqlPredicate = opts.softDelete.map(_._2),
      relations = Nil,
      prefix = opts.prefix)
}
