package graft.operators

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WriterModules.{Da00, ModuleConfig}

/** da00 first-message schema reconciliation (`da00_Writer.cpp:65-130`):
  * declared config is authoritative, gaps fill from the message, mismatches
  * are flagged, undeclared message variables are appended.
  */
class Da00ReconcileSpec extends AnyFunSuite {

  private def cfg(json: String) = ModuleConfig(
    JsonMethods.parse(json) match {
      case JObject(fs) => fs.toMap
      case _           => Map.empty
    })

  test("declared spec wins; missing dtype/shape fill from the message") {
    val c = cfg("""{"variables":[
      {"name":"signal","data_type":"int32"},
      {"name":"aux"}]}""")
    val out = Da00.reconcile(c, Map(
      "signal" -> ("int64", Seq(7L)),
      "aux"    -> ("float64", Seq(3L))))
    val byName = out.map(v => v.name -> v).toMap
    assert(byName("signal").dataType.contains("int32")) // declared wins
    assert(byName("signal").shape.contains(Seq(7L)))    // filled from message
    assert(byName("signal").mismatch)                   // int32 vs int64 flagged
    assert(byName("aux").dataType.contains("float64"))
    assert(!byName("aux").mismatch)
  }

  test("declared-but-absent kept (null-fill later); undeclared appended") {
    val c = cfg("""{"variables":[{"name":"signal","data_type":"int32","shape":[7]}]}""")
    val out = Da00.reconcile(c, Map("other" -> ("uint8", Seq(2L, 2L))))
    assert(out.map(_.name) == Seq("signal", "other"))
    assert(out.head.declared && out.head.dataType.contains("int32"))
    assert(!out(1).declared && out(1).shape.contains(Seq(2L, 2L)))
  }
}
