package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Runs the batch driver against the reference's OWN domain-test corpus
  * (templates + message fixtures, unmodified) and asserts the published
  * golden values — the closest thing to running the reference's test suite
  * against this engine. Skipped cleanly when the reference checkout isn't
  * present.
  */
class ReferenceFixturesSpec extends SparkSpec {

  private val refRoot = "/root/reference/domain-tests"

  private def run(template: String, data: String): String = {
    assume(Files.exists(Paths.get(refRoot)), "reference checkout not present")
    val out = Files.createTempDirectory("graft-ref").toString
    FileMaker.run(
      spark,
      Files.readString(Paths.get(s"$refRoot/nexus_templates/$template")),
      Files.readString(Paths.get(s"$refRoot/data_files/$data")),
      out)
    out
  }

  private def table(out: String, path: String): DataFrame =
    spark.read.parquet(s"$out/data/$path").orderBy("row")

  test("buffered_template: pre-start value 3 at 9s survives (test_buffered.py)") {
    val out = run("buffered_template.json", "buffered_data.json")
    val d   = table(out, "entry/instrument/chopper/delay/data").collect()
    assert(d.head.getAs[Double]("value") == 3.0)
    assert(d.head.getAs[Long]("time") == 9000000000L)
  }

  test("messages_before_and_after: window edges for f144 and ev44") {
    val out = run("messages_before_and_after_template.json",
      "messages_before_and_after_data.json")
    val f = table(out, "entry/instrument/chopper/delay/data").collect()
    // last pre-start value written, earlier dropped (value 5 @ 9.999s)
    assert(f.head.getAs[Double]("value") == 5.0)
    assert(f.head.getAs[Long]("time") == 9999000000L)
    // post-stop dropped: final row is 16 @ 15.0s
    assert(f.last.getAs[Double]("value") == 16.0)
    assert(f.last.getAs[Long]("time") == 15000000000L)
    val ev = table(out, "entry/instrument/event_detector/events/index").collect()
    // ev44 pre-start dropped entirely; first/last ref-times at the window edges
    assert(ev.head.getAs[Long]("event_time_zero") == 10000000000L)
    assert(ev.last.getAs[Long]("event_time_zero") == 15000000000L)
  }

  test("repeated_messages: consecutive repeats skipped (values [10,12,15])") {
    val out = run("repeated_messages_template.json", "repeated_messages_data.json")
    val d   = table(out, "entry/instrument/chopper/delay/data").collect()
    assert(d.map(_.getAs[Double]("value")).toSeq == Seq(10.0, 12.0, 15.0))
    assert(d.map(_.getAs[Long]("time")).toSeq ==
      Seq(10100000000L, 10150000000L, 10200000000L))
  }

  test("static_information: statics, inferred shapes, attrs, links " +
    "(test_static_information.py)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val out      = run("static_information_template.json", "static_information_data.json")
    val manifest = JsonMethods.parse(Files.readString(Paths.get(s"$out/manifest.json")))

    def static(path: String): JValue = (manifest \ "statics") match {
      case JArray(ss) => ss.find(s => (s \ "path") == JString(path))
        .getOrElse(fail(s"static $path missing"))
      case _ => fail("no statics in manifest")
    }
    def nums(jv: JValue): Seq[Double] = jv match {
      case JArray(xs) => xs.flatMap(nums)
      case JInt(i)    => Seq(i.toDouble)
      case JDouble(d) => Seq(d)
      case _          => Nil
    }
    def dims(jv: JValue): Seq[Int] = jv match {
      case JArray(xs) => xs.length +: xs.headOption.map(dims).getOrElse(Nil)
      case _          => Nil
    }

    // test_static_data_is_written goldens (values + inferred shapes + dtype)
    val det = static("entry/instrument/example_detector/detector_number")
    assert(nums(det \ "values") == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert((det \ "dtype") == JString("int32"))
    val xoff = static("entry/instrument/example_detector/x_pixel_offset")
    assert(nums(xoff \ "values") == Seq(10.0, 20.0, 30.0, 40.0, 50.0))
    val cyl = static("entry/instrument/example_detector/pixel_shape/cylinders")
    assert(dims(cyl \ "values") == Seq(1, 3))
    assert(nums(cyl \ "values") == Seq(0.0, 1.0, 2.0))
    val vert = static("entry/instrument/example_detector/pixel_shape/vertices")
    assert(dims(vert \ "values") == Seq(3, 3))
    assert(nums(vert \ "values") == Seq(0, 0, 0, 0, 0.05, 0, 0.002, 0, 0))
    // dataset-level attribute values (units on vertices/x_pixel_offset)
    def attrOf(jv: JValue, name: String): Option[JValue] = (jv \ "attributes") match {
      case JArray(as) => as.find(a => (a \ "name") == JString(name)).map(_ \ "values")
      case _          => None
    }
    assert(attrOf(vert, "units").contains(JString("m")))
    assert(attrOf(xoff, "units").contains(JString("m")))
    // scalar string statics
    assert((static("entry/title") \ "values") == JString("This is a title"))
    assert((static("entry/instrument/chopper/depends_on") \ "values") == JString("."))

    // test_can_create_links goldens: resolved absolute-path link targets
    def link(path: String): JValue = (manifest \ "links") match {
      case JArray(ls) => ls.find(l => (l \ "path") == JString(path))
        .getOrElse(fail(s"link $path missing"))
      case _ => fail("no links in manifest")
    }
    assert((link("entry/instrument/links/linked_value") \ "resolved") ==
      JString("entry/instrument/chopper/delay/value"))
    assert((link("entry/instrument/links/linked_time") \ "resolved") ==
      JString("entry/instrument/chopper/delay/time"))
    // the linked stream has the 4 in-window samples (len(linked_value)==4)
    val delay = table(out, "entry/instrument/chopper/delay/data").collect()
    assert(delay.map(_.getAs[Double]("value")).toSeq ==
      Seq(1000.0, 2000.0, 3000.0, 4000.0))
    assert(delay.map(_.getAs[Long]("time")).toSeq ==
      Seq(10150000000L, 10300000000L, 10450000000L, 10600000000L))
  }

  test("writer_modules: the full multi-module corpus reproduces its goldens") {
    val out = run("writer_modules_template.json", "writer_modules_data.json")
    val rs = table(out, "entry/instrument/chopper/rotation_speed/data").collect()
    assert(rs.map(_.getAs[Double]("value")).toSeq == Seq(10.0, 15.0))
    val meta = spark.read
      .parquet(s"$out/data/entry/instrument/chopper/rotation_speed/meta")
      .collect().head
    assert(meta.getAs[Double]("average_value") == 12.5)
    val idx = table(out, "entry/instrument/event_detector/events/index").collect()
    assert(idx.map(_.getAs[Long]("event_index")).toSeq == Seq(0L, 4L, 8L, 12L))
  }
}
