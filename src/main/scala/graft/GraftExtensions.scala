package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Decode, SimHash32}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so the library drops into any session via
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * (the Spark-native analog of the reference's writer-module registry,
  * `src/WriterRegistrar.cpp` — new capabilities are registered, not
  * hard-wired).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "java_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(text) - 32-bit SimHash over whitespace tokens"),
      (args: Seq[Expression]) => SimHash32(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_envelope"),
      info("decode_envelope",
        "decode_envelope(bytes) - FlatBuffers envelope: schema id, source, timestamp, validity"),
      (args: Seq[Expression]) => Decode.DecodeEnvelope(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_f144"),
      info("decode_f144", "decode_f144(bytes) - f144 LogData payload"),
      (args: Seq[Expression]) => Decode.DecodeF144(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_ev44"),
      info("decode_ev44", "decode_ev44(bytes) - ev44 event payload"),
      (args: Seq[Expression]) => Decode.DecodeEv44(args.head)))
  }
}
