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
    ext.injectFunction((
      FunctionIdentifier("decode_al00"),
      info("decode_al00", "decode_al00(bytes) - al00 alarm payload"),
      (args: Seq[Expression]) => Decode.DecodeAl00(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_ep01"),
      info("decode_ep01", "decode_ep01(bytes) - ep01 connection-status payload"),
      (args: Seq[Expression]) => Decode.DecodeEp01(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_tdct"),
      info("decode_tdct", "decode_tdct(bytes) - tdct chopper-timestamps payload"),
      (args: Seq[Expression]) => Decode.DecodeTdct(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_se00"),
      info("decode_se00", "decode_se00(bytes) - se00 sample-environment payload"),
      (args: Seq[Expression]) => Decode.DecodeSe00(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_ad00"),
      info("decode_ad00", "decode_ad00(bytes) - ad00 area-detector payload"),
      (args: Seq[Expression]) => Decode.DecodeAd00(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_da00"),
      info("decode_da00", "decode_da00(bytes) - da00 data-array payload"),
      (args: Seq[Expression]) => Decode.DecodeDa00(args.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) =>
        graft.functions.VectorExpressions.DotProduct(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of an array<double>"),
      (args: Seq[Expression]) =>
        graft.functions.VectorExpressions.L2Norm(args.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - Rabin-Karp fingerprint mod 2^61-1"),
      (args: Seq[Expression]) => graft.functions.RollingHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("token_hashes"),
      info("token_hashes",
        "token_hashes(arr) - rolling_hash of every element of an array<string> in one pass"),
      (args: Seq[Expression]) => graft.functions.TokenHashes(args.head)))
    ext.injectFunction((
      FunctionIdentifier("window_poly_hash"),
      info("window_poly_hash",
        "window_poly_hash(hashes, w) - all w-wide gram hashes of an array<long> in one pass"),
      (args: Seq[Expression]) =>
        graft.functions.WindowPolyHash(args.head, litInt(args(1), "window_poly_hash"))))
    ext.injectFunction((
      FunctionIdentifier("char_gram_codes"),
      info("char_gram_codes",
        "char_gram_codes(text, n) - packed byte codes of every char n-gram (n <= 7)"),
      (args: Seq[Expression]) =>
        graft.functions.CharGramCodes(args.head, litInt(args(1), "char_gram_codes"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs",
        "minhash_sigs(shingles, k) - k MinHash signatures of an array<string> in one pass"),
      (args: Seq[Expression]) =>
        graft.functions.MinHashSigs(args.head, litInt(args(1), "minhash_sigs"))))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text) - Gopher repetition metrics (lines, dup chars, top 2/3-grams)"),
      (args: Seq[Expression]) => graft.functions.RepetitionStats(args.head)))
    ext.injectFunction((
      FunctionIdentifier("array_min_agg"),
      info("array_min_agg",
        "array_min_agg(arr) - element-wise minimum of array<long> across the group (MinHash union)"),
      (args: Seq[Expression]) => graft.functions.ArrayMinAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("top_k_structs"),
      info("top_k_structs",
        "top_k_structs(value, k) - bounded per-group smallest-k values as a sorted array"),
      (args: Seq[Expression]) =>
        graft.functions.TopKStructs(args.head, litInt(args(1), "top_k_structs"))))
    ext.injectFunction((
      FunctionIdentifier("zorder_key"),
      info("zorder_key",
        "zorder_key(bits, c1, c2, ...) - Morton interleave of each dimension's low `bits` bits"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "zorder_key needs a literal bit width and at least one column")
        graft.operators.ZOrder.zvalueExpr(args.tail, litInt(args.head, "zorder_key"))
      }))
  }

  /** Static Int parameter of a SQL-registered expression — must be a
    * foldable integer literal (mirrors Spark's own approach for e.g.
    * `approx_count_distinct`'s rsd argument).
    */
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: second argument must be an integer literal, got $other")
  }
}
