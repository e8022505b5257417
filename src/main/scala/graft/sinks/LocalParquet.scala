package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Driver-side single-file parquet writer for DRIVER-MATERIALIZED tables —
  * the analog of the reference's writer thread appending a handful of rows
  * in-process (`src/Stream/MessageWriter.cpp:107-141`). A Spark write job
  * costs ~160 ms FIXED regardless of payload (round-12b measurement,
  * `bench_results/stream_ab_r12b.json`); for a table whose rows already
  * sit in driver memory as a `LocalRelation` (ev44's collected cue hits:
  * 1–3 rows/trigger), launching one is pure overhead. This writes the
  * rows directly with parquet-mr's PUBLIC Group API — no Spark internals
  * — into the same directory layout the Spark path appends to.
  *
  * Scope is deliberately narrow: flat schemas of primitive types
  * (long/int/double/float/boolean/string). [[supports]] gates; callers
  * fall back to the Spark write path otherwise. Schema conventions match
  * Spark's parquet writer (INT64/INT32/DOUBLE/FLOAT/BOOLEAN/BINARY-UTF8;
  * `required` for non-nullable fields) so files from both paths coexist
  * in one table directory with identical merged schemas.
  *
  * Crash safety: the file is written under a dot-prefixed temp name
  * (invisible to Spark's parquet reader) and atomically renamed into
  * place — the same no-partial-file guarantee the committer gives the
  * Spark path.
  */
object LocalParquet {

  def supports(schema: StructType): Boolean =
    schema.fields.forall(_.dataType match {
      case LongType | IntegerType | ShortType | DoubleType | FloatType |
          BooleanType | StringType => true
      case _ => false
    })

  private def parquetType(f: StructField): Type = {
    val rep =
      if (f.nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
    f.dataType match {
      case LongType    => Types.primitive(PrimitiveTypeName.INT64, rep).named(f.name)
      case IntegerType => Types.primitive(PrimitiveTypeName.INT32, rep).named(f.name)
      // Spark writes ShortType as INT32 annotated int(16) — match it so
      // files from both paths merge schemas cleanly
      case ShortType   => Types.primitive(PrimitiveTypeName.INT32, rep)
        .as(LogicalTypeAnnotation.intType(16, true)).named(f.name)
      case DoubleType  => Types.primitive(PrimitiveTypeName.DOUBLE, rep).named(f.name)
      case FloatType   => Types.primitive(PrimitiveTypeName.FLOAT, rep).named(f.name)
      case BooleanType => Types.primitive(PrimitiveTypeName.BOOLEAN, rep).named(f.name)
      case StringType  => Types.primitive(PrimitiveTypeName.BINARY, rep)
        .as(LogicalTypeAnnotation.stringType()).named(f.name)
      case other => throw new IllegalArgumentException(s"unsupported: $other")
    }
  }

  /** Write `rows` (caller-ordered) as ONE parquet file under `dir`.
    * Returns the row count written.
    */
  def write(dir: String, schema: StructType, rows: Seq[InternalRow]): Long = {
    require(supports(schema), s"unsupported schema for local write: $schema")
    Files.createDirectories(Paths.get(dir))
    val message = new MessageType("spark_schema",
      schema.fields.map(parquetType): _*)
    val name = s"part-local-${UUID.randomUUID()}.snappy.parquet"
    val tmp  = Paths.get(dir, s".$name.inprogress")
    val writer = ExampleParquetWriter.builder(new Path(tmp.toString))
      .withConf(new Configuration(false))
      .withType(message)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val factory = new SimpleGroupFactory(message)
    try rows.foreach { r =>
      val g = factory.newGroup()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!r.isNullAt(i)) f.dataType match {
          case LongType    => g.append(f.name, r.getLong(i))
          case IntegerType => g.append(f.name, r.getInt(i))
          case ShortType   => g.append(f.name, r.getShort(i).toInt)
          case DoubleType  => g.append(f.name, r.getDouble(i))
          case FloatType   => g.append(f.name, r.getFloat(i))
          case BooleanType => g.append(f.name, r.getBoolean(i))
          case StringType  => g.append(f.name,
            Binary.fromString(r.getUTF8String(i).toString))
          case other => throw new IllegalArgumentException(s"unsupported: $other")
        }
      }
      writer.write(g)
    } finally writer.close()
    // parquet-mr may leave a .crc sidecar for the temp name; drop it so the
    // directory holds only the renamed data file
    Files.deleteIfExists(Paths.get(dir, s"..$name.inprogress.crc"))
    Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
    rows.size.toLong
  }
}
