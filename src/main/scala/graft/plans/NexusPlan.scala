package graft.plans

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The engine's logical-plan model: a parsed `nexus_structure` document.
  *
  * The reference treats this JSON as schema/DDL + physical plan in one — a
  * recursive `children` tree of groups, static datasets, links, and stream
  * modules (walker: `/root/reference/src/HDFOperations.cpp:375-467`; per-node
  * settings: `src/JobCreator.cpp:47-109`). Here it parses to case classes that
  * drive DataFrame transformations and the sink layout.
  */
object NexusPlan {

  final case class AttributeSpec(name: String, dtype: Option[String], values: JValue)

  sealed trait Node { def path: String }

  final case class Group(
      path: String,
      name: String,
      attributes: Seq[AttributeSpec],
      children: Seq[Node]
  ) extends Node

  /** Literal dataset written once at structure creation
    * (`src/HDFOperations.cpp:325-352`); shape inferred from JSON nesting.
    */
  final case class StaticDataset(
      path: String,
      name: String,
      dtype: Option[String],
      values: JValue,
      attributes: Seq[AttributeSpec]
  ) extends Node

  /** HDF5 hard-link alias, resolved at job end
    * (`src/HDFOperations.cpp:478-512`).
    */
  final case class Link(path: String, name: String, target: String) extends Node

  /** Job-metadata module: start/end time scalars written at close
    * (`src/WriterModule/mdat/mdat_Writer.cpp:19-97`).
    */
  final case class Mdat(path: String, items: Seq[String]) extends Node

  /** One streaming dataflow: (topic, source, module) + module config
    * (`src/ModuleSettings.h` analog).
    */
  final case class Stream(
      path: String,
      module: String,
      source: String,
      topic: String,
      config: Map[String, JValue],
      /** true when synthesized by extra-module expansion (R2). */
      synthesized: Boolean = false
  ) extends Node

  final case class Plan(root: Seq[Node]) {
    def collect[T](pf: PartialFunction[Node, T]): Seq[T] = {
      def walk(ns: Seq[Node]): Seq[T] = ns.flatMap {
        case g: Group => pf.lift(g).toSeq ++ walk(g.children)
        case n        => pf.lift(n).toSeq
      }
      walk(root)
    }
    def streams: Seq[Stream]        = collect { case s: Stream => s }
    def statics: Seq[StaticDataset] = collect { case s: StaticDataset => s }
    def links: Seq[Link]            = collect { case l: Link => l }
    def mdats: Seq[Mdat]            = collect { case m: Mdat => m }
    def groups: Seq[Group]          = collect { case g: Group => g }
  }

  /** Modules that auto-attach companions on the same (topic, source) unless
    * disabled: f144/se00/tdct add ep01 (EPICS connection) + al00 (alarms)
    * (`src/WriterModuleBase.cpp:13-32`, `src/WriterModule/f144/f144_Writer.h:46-48`,
    * `se00_Writer.h:37`, `tdct_Writer.h:29`; expansion `src/JobCreator.cpp:162-168`).
    * Key = registered alt name used in the `enable_{name}` config flag.
    */
  private val ExtraModules: Map[String, Seq[(String, String)]] = {
    val standard = Seq("epics_con_info" -> "ep01", "alarm_info" -> "al00")
    Map("f144" -> standard, "se00" -> standard, "tdct" -> standard)
  }

  def parse(json: String): Plan = {
    val jv = JsonMethods.parse(json)
    val children = (jv \ "children") match {
      case JArray(cs) => cs.flatMap(parseNode("", _))
      case _          => Nil
    }
    Plan(expandAll(children))
  }

  private def attrs(jv: JValue): Seq[AttributeSpec] = jv \ "attributes" match {
    case JArray(as) =>
      as.flatMap { a =>
        (a \ "name") match {
          case JString(n) =>
            val dt = (a \ "dtype") match { case JString(d) => Some(d); case _ => None }
            Some(AttributeSpec(n, dt, a \ "values"))
          case _ => None
        }
      }
    // object-form attributes {k: v, ...} are also accepted by the reference
    case JObject(fields) => fields.map { case (k, v) => AttributeSpec(k, None, v) }
    case _               => Nil
  }

  private def str(jv: JValue, key: String): Option[String] =
    (jv \ key) match { case JString(s) => Some(s); case _ => None }

  private def parseNode(parent: String, jv: JValue): Option[Node] = {
    def childPath(n: String) = if (parent.isEmpty) n else s"$parent/$n"
    str(jv, "module") match {
      case Some("dataset") =>
        val cfg  = jv \ "config"
        val name = str(cfg, "name").getOrElse("")
        Some(StaticDataset(childPath(name), name, str(cfg, "dtype").orElse(str(cfg, "type")),
          cfg \ "values", attrs(jv)))
      case Some("link") =>
        val cfg = jv \ "config"
        for (n <- str(cfg, "name"); t <- str(cfg, "source"))
          yield Link(childPath(n), n, t)
      case Some("mdat") =>
        val items = (jv \ "config" \ "items") match {
          case JArray(is) => is.collect { case JString(s) => s }
          case _          => Nil
        }
        Some(Mdat(parent, items))
      case Some(module) =>
        val cfg = jv \ "config"
        val cfgMap = cfg match {
          case JObject(fields) => fields.toMap
          case _               => Map.empty[String, JValue]
        }
        val stream =
          for (src <- str(cfg, "source"); topic <- str(cfg, "topic"))
            yield Stream(parent, module, src, topic, cfgMap)
        if (stream.isEmpty)
          // the reference logs per dropped module and continues
          // (`JobCreator.cpp` extractModuleInformationFromJson); a silent
          // drop writes nothing for the stream with zero signal
          System.err.println(
            s"[graft] stream node '$module' at $parent dropped: " +
              "config must carry both source and topic")
        stream
      case None =>
        // group node: "type":"group" (or any named node with children)
        str(jv, "name").map { name =>
          val p  = childPath(name)
          val cs = (jv \ "children") match {
            case JArray(cc) => cc.flatMap(parseNode(p, _))
            case _          => Nil
          }
          Group(p, name, attrs(jv), cs)
        }
    }
  }

  /** R2 — extra-module expansion: rewrite every stream node into itself plus
    * enabled companion streams on the same (topic, source).
    */
  private def expandAll(ns: Seq[Node]): Seq[Node] = ns.flatMap {
    case g: Group  => Seq(g.copy(children = expandAll(g.children)))
    case s: Stream => s +: companions(s)
    case other     => Seq(other)
  }

  private def companions(s: Stream): Seq[Stream] =
    ExtraModules.getOrElse(s.module, Nil).flatMap { case (flagName, moduleId) =>
      val enabled = s.config.get(s"enable_$flagName") match {
        case Some(JBool(b)) => b
        case _              => true
      }
      if (enabled)
        Some(Stream(s.path, moduleId, s.source, s.topic, Map.empty, synthesized = true))
      else None
    }

  /** Flatten a JSON value's numeric leaves to doubles — ONE definition
    * shared by the da00 constants-consistency check and the HDF5 static
    * exporter, so numeric handling cannot drift between them.
    */
  def jsonDoubles(v: JValue): Seq[Double] = v match {
    case JArray(xs)  => xs.flatMap(jsonDoubles)
    case JInt(i)     => Seq(i.toDouble)
    case JLong(l)    => Seq(l.toDouble)
    case JDouble(d)  => Seq(d)
    case JDecimal(d) => Seq(d.toDouble)
    case _           => Nil
  }

  /** Integral flatten: int64 leaves above 2^53 (ns-epoch timestamps)
    * would lose low-order bits round-tripping through Double.
    */
  def jsonLongs(v: JValue): Seq[Long] = v match {
    case JArray(xs)  => xs.flatMap(jsonLongs)
    case JInt(i)     => Seq(i.toLong)
    case JLong(l)    => Seq(l)
    case JDouble(d)  => Seq(d.toLong)
    case JDecimal(d) => Seq(d.toLong)
    case _           => Nil
  }
}
