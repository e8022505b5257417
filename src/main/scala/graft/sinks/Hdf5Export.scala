package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Final HDF5 emission: convert a populated parquet-mirror output tree
  * (manifest + tables) into one native `.h5` file via [[Hdf5Writer]] — the
  * "custom HDF5 sink" end of the pipeline. Runs driver-side single-writer,
  * exactly the discipline of the reference's writer thread
  * (`src/Stream/MessageWriter.cpp:31-36`); each column streams through
  * `toLocalIterator` chunks into the writer's buffer, so the memory
  * ceiling is the emitted file itself, never a full `collect()` of a
  * table in Row form.
  */
object Hdf5Export {

  private val writer = new Hdf5Writer
  import writer._

  def export(spark: SparkSession, outDir: String, h5Path: String): Unit = {
    val closing =
      if (Files.exists(Paths.get(s"$outDir/closing.json")))
        JsonMethods.parse(Files.readString(Paths.get(s"$outDir/closing.json")))
      else JObject()
    val manifest =
      if (Files.exists(Paths.get(s"$outDir/manifest.json")))
        JsonMethods.parse(Files.readString(Paths.get(s"$outDir/manifest.json")))
      else JObject()
    val units      = twoLevel(closing \ "units")
    val groupAttrs = twoLevel(closing \ "group_attributes")
    val mdat = (closing \ "mdat") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }
      case _           => Nil
    }

    val dataRoot = Paths.get(s"$outDir/data")
    val tree     = new MutableTree
    if (Files.exists(dataRoot)) {
      // every directory containing parquet part files is one table; its
      // non-row columns become sibling datasets in the parent group
      Files.walk(dataRoot).filter(p => Files.isDirectory(p)).forEach { dir =>
        val hasParquet = Option(dir.toFile.listFiles())
          .exists(_.exists(_.getName.endsWith(".parquet")))
        if (hasParquet) {
          val rel   = dataRoot.relativize(dir).toString.replace('\\', '/')
          val par   = rel.split('/').dropRight(1).toSeq // strip table name
          val table = rel.split('/').last
          val df    = spark.read.parquet(dir.toString)
          val sorted =
            if (df.columns.contains("row")) df.orderBy("row") else df
          val groupKey = par.mkString("/")
          sorted.schema.fields.filterNot(_.name == "row").foreach { f =>
            streamedColumn(sorted, f).foreach { dv =>
              val unitAttr = units.get(groupKey).flatMap(_.get(f.name))
                .map(u => Seq("units" -> (StrAttr(u): AttrValue))).getOrElse(Nil)
              val name = if (table == "data" || table == "meta") f.name
                         else s"${table}_${f.name}"
              tree.addDataset(par, Dataset(name, dv, unitAttr))
            }
          }
          groupAttrs.get(groupKey).foreach(as =>
            tree.addAttrs(par, as.map { case (k, v) => k -> (StrAttr(v): AttrValue) }.toSeq))
        }
      }
    }
    mdat.foreach { case (k, v) =>
      tree.addDataset(Seq("entry"), Dataset(k, StrData(Array(v))))
    }

    // create-phase structure from the manifest: static dataset values
    // (shape from JSON nesting, `HDFOperations::writeDataset`,
    // `src/HDFOperations.cpp:325-352`), group attributes, and links.
    (manifest \ "statics") match {
      case JArray(ss) => ss.foreach { st =>
        (st \ "path") match {
          case JString(p) =>
            val parts = p.split('/').toSeq
            val dtype = (st \ "dtype") match { case JString(d) => Some(d); case _ => None }
            staticValue(st \ "values", dtype).foreach { dv =>
              val attrs = (st \ "attributes") match {
                case JArray(as) => as.flatMap(a => ((a \ "name"), (a \ "values")) match {
                  case (JString(n), v) => attrValue(v).map(n -> _)
                  case _               => None
                })
                case _ => Nil
              }
              tree.addDataset(parts.dropRight(1), Dataset(parts.last, dv, attrs))
            }
          case _ => ()
        }
      }
      case _ => ()
    }
    (manifest \ "groups") match {
      case JArray(gs) => gs.foreach { g =>
        ((g \ "path"), (g \ "attributes")) match {
          case (JString(p), JArray(as)) if p.nonEmpty =>
            tree.addAttrs(p.split('/').toSeq, as.flatMap(a =>
              ((a \ "name"), (a \ "values")) match {
                case (JString(n), v) => attrValue(v).map(n -> _)
                case _               => None
              }))
          case _ => ()
        }
      }
      case _ => ()
    }
    // da00 plan-time constants: written once at structure creation
    // (`da00_Writer.cpp` constants handling) — rendered as datasets under
    // the stream group from their declared spec
    (manifest \ "constants") match {
      case JArray(cs) => cs.foreach { c =>
        ((c \ "stream"), (c \ "spec" \ "name")) match {
          case (JString(streamPath), JString(name)) =>
            val spec  = c \ "spec"
            val dtype = (spec \ "data_type") match {
              case JString(d) => Some(d); case _ => None
            }
            staticValue(spec \ "data", dtype).foreach { dv =>
              tree.addDataset(streamPath.split('/').toSeq, Dataset(name, dv))
            }
          case _ => ()
        }
      }
      case _ => ()
    }
    // links: HDF5 hard links alias one object from two groups; this
    // single-pass writer materializes the alias as a VALUE COPY instead
    // (readers see identical data — the reference's own domain test
    // asserts value equality, `test_static_information.py:18-29`).
    (manifest \ "links") match {
      case JArray(ls) => ls.foreach { l =>
        ((l \ "path"), (l \ "resolved")) match {
          case (JString(p), JString(target)) =>
            tree.resolveLinkCopy(p.split('/').toSeq, target.split('/').toSeq)
          case _ => ()
        }
      }
      case _ => ()
    }
    writer.write(h5Path, tree.build())
  }

  /** Static JSON values → a typed dataset (declared dtype wins; shape from
    * nesting; inferred from JSON types otherwise).
    */
  private def staticValue(jv: JValue, dtype: Option[String]): Option[DataValue] = {
    def dims(v: JValue): Seq[Long] = v match {
      case JArray(xs) => xs.length.toLong +: xs.headOption.map(dims).getOrElse(Nil)
      case _          => Nil
    }
    def nums(v: JValue): Seq[Double] = v match {
      case JArray(xs)  => xs.flatMap(nums)
      case JInt(i)     => Seq(i.toDouble)
      case JLong(l)    => Seq(l.toDouble)
      case JDouble(d)  => Seq(d)
      case JDecimal(d) => Seq(d.toDouble)
      case _           => Nil
    }
    def strs(v: JValue): Seq[String] = v match {
      case JArray(xs) => xs.flatMap(strs)
      case JString(s) => Seq(s)
      case _          => Nil
    }
    val dm      = dims(jv)
    val shape   = if (dm.size > 1) dm else Nil
    val numeric = nums(jv)
    dtype.map(_.toLowerCase) match {
      case Some("string")                    => Some(StrData(strs(jv).toArray))
      case Some("int8" | "int16" | "uint8")  => Some(I16Data(numeric.map(_.toShort).toArray, shape))
      case Some("int32" | "uint16" | "int")  => Some(I32Data(numeric.map(_.toInt).toArray, shape))
      case Some("int64" | "uint32" | "uint64" | "long") =>
        Some(I64Data(numeric.map(_.toLong).toArray, shape))
      case Some("float" | "float32")         => Some(F32Data(numeric.map(_.toFloat).toArray, shape))
      case Some("double" | "float64")        => Some(F64Data(numeric.toArray, shape))
      case Some(_)                           => Some(F64Data(numeric.toArray, shape))
      case None => jv match {
        case JString(_) | JArray(JString(_) :: _) => Some(StrData(strs(jv).toArray))
        case JNothing | JNull                     => None
        case v if nums(v).nonEmpty || v == JArray(Nil) =>
          val allInts = v match {
            case _ if strs(v).nonEmpty => false
            case _ => flattenIsIntegral(v)
          }
          if (allInts) Some(I64Data(numeric.map(_.toLong).toArray, shape))
          else Some(F64Data(numeric.toArray, shape))
        case _ => None
      }
    }
  }

  private def flattenIsIntegral(v: JValue): Boolean = v match {
    case JArray(xs)           => xs.forall(flattenIsIntegral)
    case JInt(_) | JLong(_)   => true
    case _                    => false
  }

  private def attrValue(jv: JValue): Option[AttrValue] = jv match {
    case JString(s)  => Some(StrAttr(s))
    case JInt(i)     => Some(I64Attr(i.toLong))
    case JLong(l)    => Some(I64Attr(l))
    case JDouble(d)  => Some(F64Attr(d))
    case JDecimal(d) => Some(F64Attr(d.toDouble))
    case _           => None // array attributes not emitted (none in corpus)
  }

  private def twoLevel(jv: JValue): Map[String, Map[String, String]] = jv match {
    case JObject(fs) =>
      fs.map { case (k, v) =>
        k -> (v match {
          case JObject(inner) => inner.collect { case (ik, JString(iv)) => ik -> iv }.toMap
          case _              => Map.empty[String, String]
        })
      }.toMap
    case _ => Map.empty
  }

  /** rows pulled per chunk — bounds driver memory to one chunk per pull. */
  private val ChunkRows = 65536

  /** One column as a lazily-streamed dataset: the writer pulls chunks off
    * `toLocalIterator` (one Spark partition resident at a time) instead of
    * a full `collect()`, so the export's memory ceiling is the emitted file
    * bytes, not 2× the largest table in Row form. A zero-length typed seed
    * chunk pins the dtype of empty columns.
    */
  private def streamedColumn(
      df: org.apache.spark.sql.DataFrame,
      f: StructField
  ): Option[DataValue] = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{col, expr, size => asize}
    def rows = df.select(col(f.name)).toLocalIterator().asScala
    def chunks[T](seed: DataValue)(enc: Seq[org.apache.spark.sql.Row] => DataValue)
        : () => Iterator[DataValue] =
      () => Iterator(seed) ++ rows.grouped(ChunkRows).map(enc)
    f.dataType match {
      case LongType => Some(StreamedData(chunks(I64Data(Array.empty[Long]))(rs =>
        I64Data(rs.map(_.getLong(0)).toArray))))
      case IntegerType => Some(StreamedData(chunks(I32Data(Array.empty[Int]))(rs =>
        I32Data(rs.map(_.getInt(0)).toArray))))
      case ShortType => Some(StreamedData(chunks(I16Data(Array.empty[Short]))(rs =>
        I16Data(rs.map(_.getShort(0)).toArray))))
      case DoubleType => Some(StreamedData(chunks(F64Data(Array.empty[Double]))(rs =>
        F64Data(rs.map(_.getDouble(0)).toArray))))
      case BooleanType => Some(StreamedData(chunks(I16Data(Array.empty[Short]))(rs =>
        I16Data(rs.map(r => if (r.getBoolean(0)) 1.toShort else 0.toShort).toArray))))
      case StringType =>
        // fixed-width strings need the global max byte-width up front
        val w = Option(df.agg(expr(s"max(octet_length(`${f.name}`))")).head.get(0))
          .map(_.asInstanceOf[Number].intValue).getOrElse(1)
        Some(StreamedData(chunks(StrData(Array.empty[String]))(rs =>
          StrData(rs.map(r => Option(r.getString(0)).getOrElse("")).toArray)),
          strWidth = math.max(1, w)))
      case ArrayType(et, _) =>
        // uniform-width array columns become 2-D datasets; ragged skipped
        val widths = df.select(asize(col(f.name)).as("w")).distinct()
          .collect().map(_.getInt(0))
        if (widths.length != 1 || widths.head <= 0) None
        else {
          val w = widths.head
          et match {
            case DoubleType => Some(StreamedData(chunks(F64Data(Array.empty[Double]))(rs =>
              F64Data(rs.flatMap(_.getSeq[Double](0)).toArray)), rowWidth = w))
            case LongType => Some(StreamedData(chunks(I64Data(Array.empty[Long]))(rs =>
              I64Data(rs.flatMap(_.getSeq[Long](0)).toArray)), rowWidth = w))
            case IntegerType => Some(StreamedData(chunks(I32Data(Array.empty[Int]))(rs =>
              I32Data(rs.flatMap(_.getSeq[Int](0)).toArray)), rowWidth = w))
            case _ => None
          }
        }
      case _ => None
    }
  }

  /** path-keyed tree assembled incrementally, emitted as writer nodes. */
  private final class MutableTree {
    private val datasets = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[String], Dataset)]
    private val attrs = scala.collection.mutable.Map
      .empty[Seq[String], Seq[(String, AttrValue)]]

    def addDataset(path: Seq[String], d: Dataset): Unit = datasets += ((path, d))
    def addAttrs(path: Seq[String], as: Seq[(String, AttrValue)]): Unit =
      attrs(path) = attrs.getOrElse(path, Nil) ++ as

    /** Materialize a link as a copy of its target dataset (streamed values
      * re-pull the source, so both nodes emit the full data).
      */
    def resolveLinkCopy(linkPath: Seq[String], targetPath: Seq[String]): Unit = {
      val tPar  = targetPath.dropRight(1)
      val tName = targetPath.last
      datasets.find { case (p, d) => p == tPar && d.name == tName }.foreach {
        case (_, d) =>
          datasets += ((linkPath.dropRight(1), Dataset(linkPath.last, d.data, d.attrs)))
      }
    }

    def build(): Seq[Node] = buildLevel(Nil)

    private def buildLevel(prefix: Seq[String]): Seq[Node] = {
      val here = datasets.filter(_._1 == prefix).map(_._2).toSeq
      val childNames = (datasets.map(_._1) ++ attrs.keys)
        .filter(p => p.startsWith(prefix) && p.length > prefix.length)
        .map(_(prefix.length))
        .distinct.sorted
      val subgroups = childNames.map { n =>
        // create-phase and close-phase attrs may both name e.g. NX_class —
        // last writer wins, one message per name
        val as = attrs.getOrElse(prefix :+ n, Nil).reverse.distinctBy(_._1).reverse
        Group(n, buildLevel(prefix :+ n), as)
      }
      here ++ subgroups
    }
  }
}
