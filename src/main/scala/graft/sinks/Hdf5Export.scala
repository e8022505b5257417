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
  * (`src/Stream/MessageWriter.cpp:31-36`). Each table is scanned in ONE
  * Spark action: a single `toLocalIterator` pass demuxes every row into
  * per-column builders (string byte-widths and array-uniformity checks
  * ride the same pass), so a k-column table costs one job, not k+ — and
  * buffering full columns costs no extra ceiling because the writer's
  * output buffer already holds the entire file.
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
          tableColumns(sorted).foreach { case (f, dv) =>
            val unitAttr = units.get(groupKey).flatMap(_.get(f.name))
              .map(u => Seq("units" -> (StrAttr(u): AttrValue))).getOrElse(Nil)
            val name = if (table == "data" || table == "meta") f.name
                       else s"${table}_${f.name}"
            tree.addDataset(par, Dataset(name, dv, unitAttr))
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

  /** Every exportable column of one table from ONE `toLocalIterator`
    * pass: each row is demuxed into per-column builders; string columns
    * track their max UTF-8 byte-width and array columns their width
    * uniformity in the same pass (ragged or empty array columns are
    * skipped, as before). A zero-length typed seed chunk pins the dtype
    * of empty columns.
    */
  private def tableColumns(df: org.apache.spark.sql.DataFrame)
      : Seq[(StructField, DataValue)] = {
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col

    def streamed(seed: DataValue, data: DataValue, strWidth: Int = 0,
        rowWidth: Int = 0): DataValue =
      StreamedData(() => Iterator(seed, data), strWidth, rowWidth)

    sealed trait Acc {
      def add(r: Row, i: Int): Unit
      def result(): Option[DataValue]
    }
    final class LongAcc extends Acc {
      private val b = mutable.ArrayBuilder.make[Long]
      def add(r: Row, i: Int): Unit = b += (if (r.isNullAt(i)) 0L else r.getLong(i))
      def result() = Some(streamed(I64Data(Array.empty[Long]), I64Data(b.result())))
    }
    final class IntAcc extends Acc {
      private val b = mutable.ArrayBuilder.make[Int]
      def add(r: Row, i: Int): Unit = b += (if (r.isNullAt(i)) 0 else r.getInt(i))
      def result() = Some(streamed(I32Data(Array.empty[Int]), I32Data(b.result())))
    }
    final class ShortAcc extends Acc {
      private val b = mutable.ArrayBuilder.make[Short]
      def add(r: Row, i: Int): Unit =
        b += (if (r.isNullAt(i)) 0.toShort else r.getShort(i))
      def result() = Some(streamed(I16Data(Array.empty[Short]), I16Data(b.result())))
    }
    final class DoubleAcc extends Acc {
      private val b = mutable.ArrayBuilder.make[Double]
      def add(r: Row, i: Int): Unit =
        b += (if (r.isNullAt(i)) 0.0 else r.getDouble(i))
      def result() = Some(streamed(F64Data(Array.empty[Double]), F64Data(b.result())))
    }
    final class BoolAcc extends Acc {
      private val b = mutable.ArrayBuilder.make[Short]
      def add(r: Row, i: Int): Unit =
        b += (if (!r.isNullAt(i) && r.getBoolean(i)) 1.toShort else 0.toShort)
      def result() = Some(streamed(I16Data(Array.empty[Short]), I16Data(b.result())))
    }
    final class StrAcc extends Acc {
      private val b    = mutable.ArrayBuffer.empty[String]
      private var maxW = 1
      def add(r: Row, i: Int): Unit = {
        val s = if (r.isNullAt(i)) "" else r.getString(i)
        maxW = math.max(maxW, s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
        b += s
      }
      def result() = Some(streamed(StrData(Array.empty[String]),
        StrData(b.toArray), strWidth = maxW))
    }
    /** Flat 2-D accumulator; bails out on ragged widths. */
    final class ArrAcc(elem: DataType) extends Acc {
      private val dbl = mutable.ArrayBuilder.make[Double]
      private val lng = mutable.ArrayBuilder.make[Long]
      private val int = mutable.ArrayBuilder.make[Int]
      private var w       = -1
      private var ragged  = false
      def add(r: Row, i: Int): Unit = if (!ragged) {
        val s = if (r.isNullAt(i)) Nil else r.getSeq[Any](i)
        if (w < 0) w = s.length
        if (s.length != w) ragged = true
        else elem match {
          case DoubleType  => s.foreach(x => dbl += x.asInstanceOf[Double])
          case LongType    => s.foreach(x => lng += x.asInstanceOf[Long])
          case IntegerType => s.foreach(x => int += x.asInstanceOf[Int])
          case _           => ragged = true
        }
      }
      def result() =
        if (ragged || w <= 0) None
        else elem match {
          case DoubleType => Some(streamed(F64Data(Array.empty[Double]),
            F64Data(dbl.result()), rowWidth = w))
          case LongType => Some(streamed(I64Data(Array.empty[Long]),
            I64Data(lng.result()), rowWidth = w))
          case IntegerType => Some(streamed(I32Data(Array.empty[Int]),
            I32Data(int.result()), rowWidth = w))
          case _ => None
        }
    }

    val fields = df.schema.fields.filterNot(_.name == "row").toSeq
    val used: Seq[(StructField, Acc)] = fields.flatMap { f =>
      val acc: Option[Acc] = f.dataType match {
        case LongType    => Some(new LongAcc)
        case IntegerType => Some(new IntAcc)
        case ShortType   => Some(new ShortAcc)
        case DoubleType  => Some(new DoubleAcc)
        case BooleanType => Some(new BoolAcc)
        case StringType  => Some(new StrAcc)
        case ArrayType(et @ (DoubleType | LongType | IntegerType), _) =>
          Some(new ArrAcc(et))
        case _ => None
      }
      acc.map(f -> _)
    }
    if (used.nonEmpty) {
      df.select(used.map { case (f, _) => col(f.name) }: _*)
        .toLocalIterator().asScala.foreach { r =>
          var i = 0
          while (i < used.length) { used(i)._2.add(r, i); i += 1 }
        }
    }
    used.flatMap { case (f, a) => a.result().map(f -> _) }
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
