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
  * (`src/Stream/MessageWriter.cpp:31-36`); per-stream datasets stream
  * through one collect each (bounded by the largest single stream, not the
  * job).
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
          val rows     = sorted.collect()
          val groupKey = par.mkString("/")
          sorted.schema.fields.filterNot(_.name == "row").foreach { f =>
            datasetOf(f, rows, sorted.schema.fieldIndex(f.name)).foreach { dv =>
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

  private def datasetOf(
      f: StructField,
      rows: Array[org.apache.spark.sql.Row],
      idx: Int
  ): Option[DataValue] = f.dataType match {
    case LongType    => Some(I64Data(rows.map(_.getLong(idx))))
    case IntegerType => Some(I32Data(rows.map(_.getInt(idx))))
    case ShortType   => Some(I16Data(rows.map(_.getShort(idx))))
    case DoubleType  => Some(F64Data(rows.map(_.getDouble(idx))))
    case StringType  => Some(StrData(rows.map(r => Option(r.getString(idx)).getOrElse(""))))
    case BooleanType => Some(I16Data(rows.map(r => if (r.getBoolean(idx)) 1.toShort else 0.toShort)))
    case ArrayType(et, _) =>
      // uniform-width array columns become 2-D datasets; ragged are skipped
      val seqs = rows.map(_.getSeq[Any](idx))
      if (seqs.isEmpty) None
      else {
        val w = seqs.head.size
        if (!seqs.forall(_.size == w) || w == 0) None
        else et match {
          case DoubleType =>
            Some(F64Data(seqs.flatMap(_.map(_.asInstanceOf[Double])),
              Seq(seqs.length.toLong, w.toLong)))
          case LongType =>
            Some(I64Data(seqs.flatMap(_.map(_.asInstanceOf[Long])),
              Seq(seqs.length.toLong, w.toLong)))
          case IntegerType =>
            Some(I32Data(seqs.flatMap(_.map(_.asInstanceOf[Int])),
              Seq(seqs.length.toLong, w.toLong)))
          case _ => None
        }
      }
    case _ => None
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
