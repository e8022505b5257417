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
    writer.write(h5Path, tree.build())
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
    def chunks[T](seed: DataValue)(enc: Seq[org.apache.spark.sql.Row] => DataValue) =
      Iterator(seed) ++ rows.grouped(ChunkRows).map(enc)
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

    def build(): Seq[Node] = buildLevel(Nil)

    private def buildLevel(prefix: Seq[String]): Seq[Node] = {
      val here = datasets.filter(_._1 == prefix).map(_._2).toSeq
      val childNames = (datasets.map(_._1) ++ attrs.keys)
        .filter(p => p.startsWith(prefix) && p.length > prefix.length)
        .map(_(prefix.length))
        .distinct.sorted
      val subgroups = childNames.map { n =>
        Group(n, buildLevel(prefix :+ n), attrs.getOrElse(prefix :+ n, Nil))
      }
      here ++ subgroups
    }
  }
}
