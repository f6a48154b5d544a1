package graft.generate

import java.nio.file.{Files, Path}
import java.util.{LinkedHashMap => JLinkedHashMap, ArrayList => JArrayList}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{DumperOptions, Yaml}

import graft.model.{Docs, ModelSection, SchemaDoc, SourceSection}

/** Parse/emit of the sources & models YAML documents.
  *
  * Emission mirrors `yaml.safe_dump(..., sort_keys=False)`
  * (/root/reference/dbt_schema_builder/app.py:222-229,
  * builder.py:444-451): block style, insertion order preserved.
  */
object YamlDocs {

  def parse(text: String): SchemaDoc = {
    val root = new Yaml().load[Any](text)
    fromAny(root)
  }

  def read(path: Path): Option[SchemaDoc] =
    if (Files.exists(path)) Some(parse(Files.readString(path))) else None

  def fromAny(root: Any): SchemaDoc = root match {
    case null => SchemaDoc(2, mutable.Buffer.empty, mutable.Buffer.empty)
    case m: java.util.Map[_, _] =>
      val doc = m.asInstanceOf[java.util.Map[String, Any]].asScala
      val version = doc.get("version").map(v => String.valueOf(v).toInt).getOrElse(2)
      val sources = doc.get("sources") match {
        case Some(l: java.util.List[_]) => l.asScala.map { s =>
          val sm = s.asInstanceOf[java.util.Map[String, Any]].asScala
          SourceSection(
            name = String.valueOf(sm.getOrElse("name", "")),
            database = sm.get("database").map(String.valueOf).orNull,
            tables = sm.get("tables") match {
              case Some(tl: java.util.List[_]) =>
                tl.asScala.map(t => toTableEntry(t)).toBuffer
              case _ => mutable.Buffer.empty[Docs.TableEntry]
            })
        }.toBuffer
        case _ => mutable.Buffer.empty[SourceSection]
      }
      val models = doc.get("models") match {
        case Some(l: java.util.List[_]) => l.asScala.map { mo =>
          val mm = mo.asInstanceOf[java.util.Map[String, Any]].asScala
          ModelSection(
            name = String.valueOf(mm.getOrElse("name", "")),
            columns = mm.get("columns") match {
              case Some(cl: java.util.List[_]) => cl.asScala.toSeq.map {
                case cm: java.util.Map[_, _] =>
                  String.valueOf(cm.asInstanceOf[java.util.Map[String, Any]].get("name"))
                case other => String.valueOf(other)
              }
              case _ => Nil
            })
        }.toBuffer
        case _ => mutable.Buffer.empty[ModelSection]
      }
      SchemaDoc(version, sources, models)
    case other =>
      throw new IllegalArgumentException(s"Expected a YAML mapping document, got $other")
  }

  private def toTableEntry(t: Any): Docs.TableEntry = t match {
    case null => null
    case m: java.util.Map[_, _] =>
      val e = new mutable.LinkedHashMap[String, Any]
      m.asInstanceOf[java.util.Map[String, Any]].asScala.foreach { case (k, v) => e += (k -> v) }
      e
    case other => Docs.tableEntry("name" -> String.valueOf(other))
  }

  // ------------------------------------------------------------------ emit

  def emit(doc: SchemaDoc): String = {
    val opts = new DumperOptions
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    new Yaml(opts).dump(toJava(doc))
  }

  def write(path: Path, doc: SchemaDoc): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.writeString(path, emit(doc))
  }

  def toJava(doc: SchemaDoc): JLinkedHashMap[String, Any] = {
    val root = new JLinkedHashMap[String, Any]
    root.put("version", doc.version)
    val sources = new JArrayList[Any]
    doc.sources.foreach { s =>
      val sm = new JLinkedHashMap[String, Any]
      sm.put("name", s.name)
      if (s.database != null) sm.put("database", s.database)
      val tables = new JArrayList[Any]
      s.tables.foreach(t => tables.add(tableToJava(t)))
      sm.put("tables", tables)
      sources.add(sm)
    }
    root.put("sources", sources)
    val models = new JArrayList[Any]
    doc.models.foreach { m =>
      val mm = new JLinkedHashMap[String, Any]
      mm.put("name", m.name)
      val cols = new JArrayList[Any]
      m.columns.foreach { c =>
        val cm = new JLinkedHashMap[String, Any]
        cm.put("name", c)
        cols.add(cm)
      }
      mm.put("columns", cols)
      models.add(mm)
    }
    root.put("models", models)
    root
  }

  private def tableToJava(t: Docs.TableEntry): Any = {
    if (t == null) return null
    val m = new JLinkedHashMap[String, Any]
    t.foreach { case (k, v) => m.put(k, deepToJava(v)) }
    m
  }

  private def deepToJava(v: Any): Any = v match {
    case m: mutable.LinkedHashMap[_, _] =>
      val jm = new JLinkedHashMap[String, Any]
      m.foreach { case (k, vv) => jm.put(String.valueOf(k), deepToJava(vv)) }
      jm
    case m: Map[_, _] =>
      val jm = new JLinkedHashMap[String, Any]
      m.foreach { case (k, vv) => jm.put(String.valueOf(k), deepToJava(vv)) }
      jm
    case s: Seq[_] =>
      val jl = new JArrayList[Any]
      s.foreach(e => jl.add(deepToJava(e)))
      jl
    case other => other // java maps/lists/scalars from snakeyaml pass through
  }
}
