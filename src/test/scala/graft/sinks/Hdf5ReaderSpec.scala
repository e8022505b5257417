package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** An INDEPENDENT minimal HDF5 reader (parsed from the public file-format
  * spec, separate code path from the writer) + round-trip tests. With no
  * HDF5 library available in this environment this is the strongest
  * validation possible: structural traversal (superblock → object headers
  * → symbol-table B-tree → SNOD → heap) must agree between two
  * implementations for the bytes to round-trip. The literal
  * tooling-absence evidence (no h5py/h5dump/Java HDF5 anywhere on the
  * box) is recorded in `docs/environment_limits.md`; `Hdf5GoldenSpec`
  * additionally pins a byte-golden fixture to the spec document itself.
  */
object MiniHdf5Reader {

  final case class Obj(
      datasets: Map[String, Any],
      groups: Map[String, Obj],
      attrs: Map[String, Any])

  def read(path: String): Obj = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb    = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getLong(0) != 0, "empty file")
    val sig = Array.tabulate(8)(i => bytes(i))
    require(sig(1) == 'H' && sig(2) == 'D' && sig(3) == 'F', "not an HDF5 file")
    require(bytes(8) == 0, s"superblock version ${bytes(8)}")
    val eof = bb.getLong(40)
    require(eof == bytes.length.toLong, s"EOF addr $eof != file size ${bytes.length}")
    val rootHeader = bb.getLong(64) // root STE: link(8) then header addr
    readObject(bb, rootHeader)
  }

  private def readObject(bb: ByteBuffer, addr: Long): Obj = {
    val a = addr.toInt
    require(bb.get(a) == 1, s"object header version at $addr")
    val nmsg     = bb.getShort(a + 2) & 0xffff
    val bodySize = bb.getInt(a + 8)
    var pos      = a + 16
    val end      = a + 16 + bodySize
    var datasets = Map.empty[String, Any]
    var groups   = Map.empty[String, Obj]
    var attrs    = Map.empty[String, Any]
    var space: Seq[Long]            = Nil
    var dtype: Option[(Int, Int)]   = None // (class, size)
    var layout: Option[(Long, Long)] = None
    var read = 0
    while (read < nmsg && pos < end) {
      val tpe  = bb.getShort(pos) & 0xffff
      val size = bb.getShort(pos + 2) & 0xffff
      val body = pos + 8
      tpe match {
        case 0x0011 => // symbol table: btree + heap
          val (btree, heap) = (bb.getLong(body), bb.getLong(body + 8))
          groups = readGroupEntries(bb, btree, heap).map { case (n, oa) =>
            n -> readObject(bb, oa)
          }
        case 0x0001 =>
          val rank = bb.get(body + 1).toInt
          space = (0 until rank).map(i => bb.getLong(body + 8 + 8 * i))
        case 0x0003 =>
          dtype = Some(((bb.get(body) & 0x0f), bb.getInt(body + 4)))
        case 0x0008 =>
          require(bb.get(body) == 3 && bb.get(body + 1) == 1, "layout v3 contiguous")
          layout = Some((bb.getLong(body + 2), bb.getLong(body + 10)))
        case 0x000C =>
          val (n, v) = readAttr(bb, body)
          attrs += n -> v
        case _ => ()
      }
      pos += 8 + size
      read += 1
    }
    for ((cls, esz) <- dtype; (daddr, dsz) <- layout) {
      val n = (dsz / esz).toInt
      val d = daddr.toInt
      val v: Any = cls match {
        case 0 if esz == 2 => Array.tabulate(n)(i => bb.getShort(d + 2 * i))
        case 0 if esz == 4 => Array.tabulate(n)(i => bb.getInt(d + 4 * i))
        case 0 if esz == 8 => Array.tabulate(n)(i => bb.getLong(d + 8 * i))
        case 1 if esz == 4 => Array.tabulate(n)(i => bb.getFloat(d + 4 * i))
        case 1 if esz == 8 => Array.tabulate(n)(i => bb.getDouble(d + 8 * i))
        case 3 =>
          Array.tabulate(n) { i =>
            val raw = Array.tabulate(esz)(j => bb.get(d + esz * i + j))
            new String(raw.takeWhile(_ != 0), "UTF-8")
          }
        case other => s"unsupported class $other"
      }
      datasets += "" -> v
    }
    Obj(datasets, groups, attrs)
  }

  private def readGroupEntries(bb: ByteBuffer, btree: Long, heap: Long): Map[String, Long] = {
    val t = btree.toInt
    require(bb.get(t) == 'T' && bb.get(t + 1) == 'R', "TREE signature")
    // enforce libhdf5's fixed node extents from the superblock's declared
    // k values: a truncated node would make the metadata read run past EOA
    val leafK      = bb.getShort(16).toInt
    val internalK  = bb.getShort(18).toInt
    val btreeBytes = 24 + (2 * internalK + 1) * 8 + 2 * internalK * 8
    val snodBytes  = 8 + 2 * leafK * 40
    require(t + btreeBytes <= bb.capacity,
      s"B-tree node at $t truncated: needs $btreeBytes bytes before EOF")
    val entries = bb.getShort(t + 6) & 0xffff
    require(entries <= 2 * internalK, s"B-tree node holds $entries > ${2 * internalK}")
    if (entries == 0) return Map.empty
    // internal node (level > 0): children are lower B-tree nodes — recurse
    val level = bb.get(t + 5) & 0xff
    if (level > 0)
      return (0 until entries).flatMap { e =>
        readGroupEntries(bb, bb.getLong(t + 24 + 16 * e + 8), heap)
      }.toMap
    // heap data segment address from the heap header
    val heapSeg = bb.getLong(heap.toInt + 24)
    (0 until entries).flatMap { e =>
      val snod = bb.getLong(t + 24 + 16 * e + 8).toInt
      require(bb.get(snod) == 'S' && bb.get(snod + 1) == 'N', "SNOD signature")
      require(snod + snodBytes <= bb.capacity,
        s"SNOD at $snod truncated: needs $snodBytes bytes before EOF")
      val count = bb.getShort(snod + 6) & 0xffff
      require(count <= 2 * leafK, s"SNOD holds $count > ${2 * leafK} entries")
      (0 until count).map { i =>
        val ste     = snod + 8 + 40 * i
        val nameOff = bb.getLong(ste)
        val objAddr = bb.getLong(ste + 8)
        var p       = (heapSeg + nameOff).toInt
        val sb      = new StringBuilder
        while (bb.get(p) != 0) { sb.append(bb.get(p).toChar); p += 1 }
        sb.toString -> objAddr
      }
    }.toMap
  }

  private def readAttr(bb: ByteBuffer, body: Int): (String, Any) = {
    def align8(n: Int) = (n + 7) & ~7
    val nameSize = bb.getShort(body + 2) & 0xffff
    val dtSize   = bb.getShort(body + 4) & 0xffff
    val dsSize   = bb.getShort(body + 6) & 0xffff
    val nameBytes = Array.tabulate(nameSize)(i => bb.get(body + 8 + i))
    val name      = new String(nameBytes.takeWhile(_ != 0), "UTF-8")
    val dtPos     = body + 8 + align8(nameSize)
    val cls       = bb.get(dtPos) & 0x0f
    val esz       = bb.getInt(dtPos + 4)
    val dataPos   = dtPos + align8(dtSize) + align8(dsSize)
    val value: Any = cls match {
      case 0 => bb.getLong(dataPos)
      case 1 => bb.getDouble(dataPos)
      case 3 =>
        val raw = Array.tabulate(esz)(i => bb.get(dataPos + i))
        new String(raw.takeWhile(_ != 0), "UTF-8")
      case other => s"unsupported class $other"
    }
    name -> value
  }
}

class Hdf5ReaderSpec extends graft.SparkSpec {

  test("writer output round-trips through the independent reader") {
    val w = new Hdf5Writer
    import w._
    val path = Files.createTempFile("graft", ".h5").toString
    w.write(path, Seq(
      Group("entry", Seq(
        Dataset("value", F64Data(Array(10.0, 15.0)), Seq("units" -> StrAttr("Hz"))),
        Dataset("time", I64Data(Array(10100000000L, 10110000000L))),
        Group("nested", Seq(
          Dataset("image", I32Data(Array(10, 11, 12, 13), dims = Seq(2L, 2L))),
          Dataset("names", StrData(Array("alpha", "beta"))),
          Dataset("status", I16Data(Array[Short](2, 2)))
        ))
      ), Seq("NX_class" -> StrAttr("NXentry"), "version" -> F64Attr(1.5)))
    ))
    val root  = MiniHdf5Reader.read(path)
    val entry = root.groups("entry")
    assert(entry.attrs("NX_class") == "NXentry")
    assert(entry.attrs("version") == 1.5)
    assert(entry.groups("value").datasets("").asInstanceOf[Array[Double]].toSeq ==
      Seq(10.0, 15.0))
    assert(entry.groups("value").attrs("units") == "Hz")
    assert(entry.groups("time").datasets("").asInstanceOf[Array[Long]].toSeq ==
      Seq(10100000000L, 10110000000L))
    val nested = entry.groups("nested")
    assert(nested.groups("image").datasets("").asInstanceOf[Array[Int]].toSeq ==
      Seq(10, 11, 12, 13))
    assert(nested.groups("names").datasets("").asInstanceOf[Array[String]].toSeq ==
      Seq("alpha", "beta"))
    assert(nested.groups("status").datasets("").asInstanceOf[Array[Short]].toSeq ==
      Seq[Short](2, 2))
  }

  test("FileMaker output exports to a native .h5 with the domain goldens") {
    val refRoot = "/root/reference/domain-tests"
    assume(Files.exists(Paths.get(refRoot)), "reference checkout not present")
    val out = Files.createTempDirectory("graft-h5").toString
    graft.FileMaker.run(
      spark,
      Files.readString(Paths.get(s"$refRoot/nexus_templates/writer_modules_template.json")),
      Files.readString(Paths.get(s"$refRoot/data_files/writer_modules_data.json")),
      out)
    val h5 = s"$out/out.h5"
    Hdf5Export.export(spark, out, h5)
    val root  = MiniHdf5Reader.read(h5)
    val speed = root.groups("entry").groups("instrument").groups("chopper")
      .groups("rotation_speed")
    assert(speed.groups("value").datasets("").asInstanceOf[Array[Double]].toSeq ==
      Seq(10.0, 15.0))
    assert(speed.groups("value").attrs("units") == "Hz")
    assert(speed.groups("time").datasets("").asInstanceOf[Array[Long]].toSeq ==
      Seq(10100000000L, 10110000000L))
    assert(speed.groups("minimum_value").datasets("").asInstanceOf[Array[Double]].head == 10.0)
    assert(speed.groups("average_value").datasets("").asInstanceOf[Array[Double]].head == 12.5)
    val events = root.groups("entry").groups("instrument").groups("event_detector")
      .groups("events")
    assert(events.groups("events_event_time_offset").datasets("")
      .asInstanceOf[Array[Int]].toSeq == (1 to 16).map(_ * 10))
    assert(events.groups("index_event_index").datasets("")
      .asInstanceOf[Array[Long]].toSeq == Seq(0L, 4L, 8L, 12L))
    assert(root.groups("entry").groups("start_time").datasets("")
      .asInstanceOf[Array[String]].head == "1970-01-01T00:00:10Z")
  }

  test("statics, attributes, and links land in the native .h5 " +
    "(test_static_information.py goldens)") {
    val refRoot = "/root/reference/domain-tests"
    assume(Files.exists(Paths.get(refRoot)), "reference checkout not present")
    val out = Files.createTempDirectory("graft-h5s").toString
    graft.FileMaker.run(
      spark,
      Files.readString(Paths.get(s"$refRoot/nexus_templates/static_information_template.json")),
      Files.readString(Paths.get(s"$refRoot/data_files/static_information_data.json")),
      out)
    val h5 = s"$out/static.h5"
    Hdf5Export.export(spark, out, h5)
    val root = MiniHdf5Reader.read(h5)
    val inst = root.groups("entry").groups("instrument")
    val det  = inst.groups("example_detector")
    assert(det.groups("detector_number").datasets("").asInstanceOf[Array[Int]].toSeq ==
      Seq(1, 2, 3, 4, 5))
    assert(det.groups("x_pixel_offset").datasets("").asInstanceOf[Array[Float]].toSeq ==
      Seq(10f, 20f, 30f, 40f, 50f))
    assert(det.groups("x_pixel_offset").attrs("units") == "m")
    val shape = det.groups("pixel_shape")
    assert(shape.groups("cylinders").datasets("").asInstanceOf[Array[Int]].toSeq ==
      Seq(0, 1, 2)) // 1×3 — flattened values with a 2-D dataspace
    assert(shape.groups("vertices").datasets("").asInstanceOf[Array[Float]].toSeq ==
      Seq(0f, 0f, 0f, 0f, 0.05f, 0f, 0.002f, 0f, 0f))
    assert(root.groups("entry").groups("title").datasets("")
      .asInstanceOf[Array[String]].head == "This is a title")
    assert(inst.groups("chopper").attrs("NX_class") == "NXdisk_chopper")
    // links materialize as value copies equal to their targets
    val delay = inst.groups("chopper").groups("delay")
    val links = inst.groups("links")
    assert(links.groups("linked_value").datasets("").asInstanceOf[Array[Double]].toSeq ==
      delay.groups("value").datasets("").asInstanceOf[Array[Double]].toSeq)
    assert(links.groups("linked_time").datasets("").asInstanceOf[Array[Long]].toSeq ==
      delay.groups("time").datasets("").asInstanceOf[Array[Long]].toSeq)
    assert(links.groups("linked_value").datasets("").asInstanceOf[Array[Double]].length == 4)
  }

  test("da00 plan-time constants land in the native .h5") {
    import spark.implicits._
    val template =
      """{ "children": [
        |  { "name": "arr", "type": "group", "children": [
        |    { "module": "da00",
        |      "config": { "source": "arr", "topic": "tp",
        |                  "variables": [ {"name": "signal"} ],
        |                  "constants": [
        |                    {"name": "cal", "data_type": "float64",
        |                     "data": [1.5, 2.5]} ] } } ] }
        |] }""".stripMargin
    val out = Files.createTempDirectory("graft-h5c").toString
    val job = new graft.streaming.StreamingJob(
      spark, graft.plans.NexusPlan.parse(template), out, 10000, 15000)
    job.processBatch("da00", Seq(
      graft.sources.Fixtures.Da00Msg("tp", "arr", 0, 10100, 10100000000L,
        "signal", "x", Seq(7.0))).toDF())
    job.finish()
    val h5 = s"$out/out.h5"
    Hdf5Export.export(spark, out, h5)
    val arr = MiniHdf5Reader.read(h5).groups("arr")
    assert(arr.groups("cal").datasets("").asInstanceOf[Array[Double]].toSeq ==
      Seq(1.5, 2.5))
  }

  test("wide groups split across fixed-capacity symbol-table nodes") {
    val w = new Hdf5Writer
    import w._
    val path = Files.createTempFile("graft", ".h5").toString
    // 23 children > 2·leaf_k=8 forces a multi-SNOD B-tree (the f144
    // stream layout alone emits 8 sibling datasets; entry groups exceed it)
    val kids = (0 until 23).map(i => Dataset(f"d$i%02d", I64Data(Array(i.toLong))))
    w.write(path, Seq(Group("wide", kids, Seq("empty" -> StrAttr("")))))
    val wide = MiniHdf5Reader.read(path).groups("wide")
    assert(wide.groups.keySet == (0 until 23).map(i => f"d$i%02d").toSet)
    (0 until 23).foreach { i =>
      assert(wide.groups(f"d$i%02d").datasets("").asInstanceOf[Array[Long]].toSeq ==
        Seq(i.toLong))
    }
    assert(wide.attrs("empty") == "")
  }

  test("float/short columns, null-filled array cells, and big int64 statics export") {
    import org.apache.spark.sql.types._
    val out = Files.createTempDirectory("graft-h5t").toString
    // a table with the dtypes the accumulator set previously dropped
    // silently: float scalar (f144 "type": "float"), float and int16
    // arrays (ad00 dtypes), and a null array cell (da00's null-filled
    // missing variable — the reference still writes the dataset)
    val schema = StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("fval", FloatType, nullable = true),
      StructField("farr", ArrayType(FloatType), nullable = true),
      StructField("sarr", ArrayType(ShortType), nullable = true),
      StructField("darr", ArrayType(DoubleType), nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(0L, 1.5f, Seq(1f, 2f), Seq(1.toShort, 2.toShort), null),
      org.apache.spark.sql.Row(1L, 2.5f, Seq(3f, 4f), Seq(3.toShort, 4.toShort),
        Seq(7.0, 8.0)))
    spark.createDataFrame(rows, schema)
      .coalesce(1).write.parquet(s"$out/data/g/data")
    // an int64 static above 2^53: a Double round-trip would corrupt it
    val big = 1723802466123456789L
    Files.writeString(Paths.get(s"$out/manifest.json"),
      s"""{"groups":[],"links":[],"streams":[],
         |"statics":[{"path":"entry/big_ts","dtype":"int64","values":$big}]}"""
        .stripMargin)
    val h5 = s"$out/t.h5"
    Hdf5Export.export(spark, out, h5)
    val g = MiniHdf5Reader.read(h5).groups("g")
    assert(g.groups("fval").datasets("").asInstanceOf[Array[Float]].toSeq ==
      Seq(1.5f, 2.5f))
    assert(g.groups("farr").datasets("").asInstanceOf[Array[Float]].toSeq ==
      Seq(1f, 2f, 3f, 4f))
    assert(g.groups("sarr").datasets("").asInstanceOf[Array[Short]].toSeq ==
      Seq(1, 2, 3, 4).map(_.toShort))
    val darr = g.groups("darr").datasets("").asInstanceOf[Array[Double]]
    assert(darr.length == 4 && darr(0).isNaN && darr(1).isNaN &&
      darr(2) == 7.0 && darr(3) == 8.0,
      s"null cell must fill, not drop the dataset: ${darr.toSeq}")
    assert(MiniHdf5Reader.read(h5).groups("entry").groups("big_ts")
      .datasets("").asInstanceOf[Array[Long]].toSeq == Seq(big))
  }

  test("group fan-out beyond one B-tree node builds a multi-level tree") {
    // 300 children > 2·internal_k · 2·leaf_k = 256 forces a level-1
    // internal node over sibling-linked leaves (a reference-scale
    // instrument group with hundreds of PV streams); 9000 forces a
    // second internal level. All names and values must survive.
    for (n <- Seq(300, 9000)) {
      val w = new Hdf5Writer
      import w._
      val path = Files.createTempFile("graft", ".h5").toString
      val kids = (0 until n).map(i => Dataset(f"d$i%04d", I64Data(Array(i.toLong))))
      w.write(path, Seq(Group("huge", kids)))
      val huge = MiniHdf5Reader.read(path).groups("huge")
      assert(huge.groups.keySet == (0 until n).map(i => f"d$i%04d").toSet)
      for (i <- Seq(0, 1, n / 2, n - 2, n - 1))
        assert(huge.groups(f"d$i%04d").datasets("")
          .asInstanceOf[Array[Long]].toSeq == Seq(i.toLong))
    }
  }

  test("files larger than the channel staging buffer round-trip " +
    "(multi-flush FileChannel path)") {
    val w = new Hdf5Writer
    import w._
    val path = Files.createTempFile("graft-big", ".h5").toString
    // 400k longs = 3.2 MB of data through the 1 MiB staging buffer, pulled
    // in 10 chunks the way Hdf5Export streams spilled columns
    val n = 400000
    val chunks = () => (0 until 10).iterator.map(c =>
      I64Data(Array.tabulate(n / 10)(i => (c * (n / 10) + i).toLong)))
    w.write(path, Seq(
      Group("entry", Seq(
        Dataset("big", StreamedData(chunks)),
        Dataset("tail", I64Data(Array(42L))) // metadata AFTER the big data
      ))))
    assert(Files.size(Paths.get(path)) > (1 << 20) * 3)
    val entry = MiniHdf5Reader.read(path).groups("entry")
    val big   = entry.groups("big").datasets("").asInstanceOf[Array[Long]]
    assert(big.length == n)
    assert(big(0) == 0L && big(123456) == 123456L && big(n - 1) == (n - 1).toLong)
    assert(entry.groups("tail").datasets("").asInstanceOf[Array[Long]].toSeq == Seq(42L))
  }

  test("export heap is bounded by the spill chunk, not the table size") {
    import spark.implicits._
    val prevChunk = Hdf5Export.spillChunkValues
    Hdf5Export.spillChunkValues = 1024
    Hdf5Export.maxResidentValues = 0L
    try {
      val out = Files.createTempDirectory("graft-h5out").toString
      val n   = 50000
      (0 until n).map(i => (i.toLong, i.toLong * 3, f"s$i%05d", i * 0.5,
          Seq(i * 1.0, i * 2.0, i * 3.0, i * 4.0)))
        .toDF("row", "v", "name", "x", "arr")
        .coalesce(1)
        .write.parquet(s"$out/data/entry/data")
      val h5 = s"$out/spill.h5"
      Hdf5Export.export(spark, out, h5)
      // every column builder spilled: resident high-water is the chunk
      // size, though the table is 50× larger
      assert(Hdf5Export.maxResidentValues <= 1024L,
        s"resident ${Hdf5Export.maxResidentValues} > chunk 1024")
      val entry = MiniHdf5Reader.read(h5).groups("entry")
      val v     = entry.groups("v").datasets("").asInstanceOf[Array[Long]]
      val names = entry.groups("name").datasets("").asInstanceOf[Array[String]]
      val xs    = entry.groups("x").datasets("").asInstanceOf[Array[Double]]
      assert(v.length == n && names.length == n && xs.length == n)
      assert(v(0) == 0L && v(n - 1) == (n - 1).toLong * 3)
      assert(names(12345) == "s12345" && xs(n - 1) == (n - 1) * 0.5)
      // the flat-2D (array-column) accumulator spills too: 200k values in
      // 1024-value chunks whose boundaries do NOT align to the 4-wide
      // rows — flattened order must still be exact
      val arr = entry.groups("arr").datasets("").asInstanceOf[Array[Double]]
      assert(arr.length == 4 * n)
      assert(arr(4 * 12345 + 2) == 12345 * 3.0 && arr(4 * n - 1) == (n - 1) * 4.0)
      // spill temp files are cleaned up after the export
      val leftovers = Files.list(Paths.get(System.getProperty("java.io.tmpdir")))
        .filter { p =>
          val f = p.getFileName.toString
          f.startsWith("graft-h5spill") && f.endsWith(".bin")
        }
        .count()
      assert(leftovers == 0L, s"$leftovers spill files not cleaned up")
    } finally {
      Hdf5Export.spillChunkValues = prevChunk
    }
  }

  test("empty groups and empty datasets survive") {
    val w = new Hdf5Writer
    import w._
    val path = Files.createTempFile("graft", ".h5").toString
    w.write(path, Seq(Group("empty"), Dataset("none", F64Data(Array.empty[Double]))))
    val root = MiniHdf5Reader.read(path)
    assert(root.groups.keySet == Set("empty", "none"))
    assert(root.groups("none").datasets("").asInstanceOf[Array[Double]].isEmpty)
  }
}
