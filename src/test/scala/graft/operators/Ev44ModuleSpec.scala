package graft.operators

import org.json4s.JsonAST.{JInt, JValue}

import graft.SparkSpec
import graft.operators.WriterModules.{Ev44, ModuleConfig}
import graft.sources.Fixtures.Ev44Msg

/** ev44 module details beyond the domain goldens: multi-element reference
  * times, empty-message handling, and the event-count cue index
  * (`ev44_Writer.cpp:92-138`).
  */
class Ev44ModuleSpec extends SparkSpec {
  import spark.implicits._

  private def msg(offset: Long, refs: Seq[Long], rti: Seq[Int], tof: Seq[Int]) =
    Ev44Msg("t", "det", offset, offset, refs.headOption.getOrElse(0L),
      refs, rti, tof, tof.map(_ + 1))

  private def cfg(interval: Long) =
    ModuleConfig(Map[String, JValue]("cue_interval" -> JInt(interval)))

  test("every reference_time element lands; each index shifted by prior events") {
    val df = Seq(
      msg(0, Seq(100L, 200L), Seq(0, 3), Seq(1, 2, 3, 4, 5)), // 5 events, 2 pulses
      msg(1, Seq(300L), Seq(0), Seq(6, 7))                    // 2 events
    ).toDF()
    val idx = Ev44.tables(df, cfg(1000))("index").orderBy("row").collect()
    assert(idx.map(_.getAs[Long]("event_time_zero")).toSeq == Seq(100L, 200L, 300L))
    assert(idx.map(_.getAs[Long]("event_index")).toSeq == Seq(0L, 3L, 5L))
  }

  test("empty messages append events rows nothing and no pulse entries") {
    val df = Seq(msg(0, Seq(100L), Seq(0), Seq()), msg(1, Seq(200L), Seq(0), Seq(9)))
      .toDF()
    val t = Ev44.tables(df, cfg(1000))
    assert(t("index").count() == 1)
    assert(t("events").count() == 1)
  }

  test("f144 cue: every Nth write emits (row index, timestamp); off by default") {
    import graft.sources.Fixtures.F144Msg
    import graft.operators.WriterModules.F144
    val df = (0 until 7).map(i =>
      F144Msg("t", "s", i.toLong, i.toLong, 1000L + i, i.toDouble)).toDF()
    val cue = F144.tables(df, cfg(3))("cue").orderBy("cue_index").collect()
    assert(cue.map(_.getAs[Long]("cue_index")).toSeq == Seq(2L, 5L))
    assert(cue.map(_.getAs[Long]("cue_timestamp_zero")).toSeq == Seq(1002L, 1005L))
    // default interval (u32::max semantics) ⇒ no cue table at all
    assert(!F144.tables(df, cfg2(Map.empty))("data").isEmpty)
    assert(!F144.tables(df, ModuleConfig(Map.empty)).contains("cue"))
  }
  private def cfg2(m: Map[String, JValue]) = ModuleConfig(m)

  test("cue emitted when the cumulative event count crosses the interval") {
    val df = Seq(
      msg(0, Seq(100L), Seq(0), (1 to 3).toSeq),  // cum 3
      msg(1, Seq(200L), Seq(0), (1 to 3).toSeq),  // cum 6 → crosses 5
      msg(2, Seq(300L), Seq(0), (1 to 2).toSeq),  // cum 8
      msg(3, Seq(400L), Seq(0), (1 to 3).toSeq)   // cum 11 → crosses 10
    ).toDF()
    val cue = Ev44.tables(df, cfg(5))("cue").orderBy("cue_index").collect()
    assert(cue.map(_.getAs[Long]("cue_index")).toSeq == Seq(5L, 10L))
    // stamped with last ref time + last tof of the crossing message
    assert(cue.map(_.getAs[Long]("cue_timestamp_zero")).toSeq == Seq(203L, 403L))
  }
}
