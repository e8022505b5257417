package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** SECOND byte-golden pin of [[Hdf5Writer]] against the PUBLIC HDF5 File
  * Format Specification — the first ([[Hdf5GoldenSpec]]) covers the
  * minimal root + one contiguous dataset; this one pins the MULTI-OBJECT
  * SYMBOL-TABLE path the first cannot reach:
  *
  *   - a NESTED group (child group under root, written depth-first);
  *   - a group with NINE children — more than one symbol-table node's
  *     2·leaf_k = 8 capacity — so the B-tree leaf holds TWO SNOD entries
  *     with real separating keys (key_1 = heap offset of SNOD 0's largest
  *     link name, per spec III.A's key invariant);
  *   - a multi-entry SNOD with ascending heap name offsets (links sorted
  *     by unsigned-byte name compare, spec III.C);
  *   - a root SNOD holding two entries of DIFFERENT node kinds (a group
  *     and a dataset, name-sorted);
  *   - a group ATTRIBUTE message (v1, 8-aligned name/datatype/dataspace
  *     segments, spec IV: attribute message).
  *
  * Every byte of the expected image is hand-built from the spec document;
  * each structure's offset is derived in comments from the writer's
  * append-only allocation discipline (superblock placeholder first,
  * children depth-first before parents, heap → SNODs → B-tree → object
  * header within a group). Any byte drift fails with the first offset.
  */
class Hdf5Golden2Spec extends AnyFunSuite {

  private val Undef = -1L

  /** Derived file map (hand-computed; dataset k ∈ 0..8 is "a".."i"):
    *
    * | offset      | size | structure                                  |
    * |-------------|------|--------------------------------------------|
    * | 0           |   96 | superblock v0 (+ root STE)                 |
    * | 96 + 100k   |    4 | dataset k raw data: [k+1] as i32 LE        |
    * | 100 + 100k  |   96 | dataset k object header (3 msgs)           |
    * | 996         |  112 | g's local heap (32 hdr + 80 segment)       |
    * | 1108        |  328 | g SNOD 0: "a".."h" (8 entries, FULL)       |
    * | 1436        |  328 | g SNOD 1: "i" (1 entry, 7 slots zeroed)    |
    * | 1764        |  544 | g TREE v1 leaf (2 entries)                 |
    * | 2308        |   96 | g object header (symbol table + attribute) |
    * | 2404        |    4 | dataset "z" raw data: [42] as i32 LE       |
    * | 2408        |   96 | dataset "z" object header                  |
    * | 2504        |   56 | root local heap (32 hdr + 24 segment)      |
    * | 2560        |  328 | root SNOD: "g","z" (2 entries)             |
    * | 2888        |  544 | root TREE v1 leaf (1 entry)                |
    * | 3432        |   40 | root group object header (1 msg)           |
    * | 3472        |      | end of file                                |
    */
  private def dsRawAddr(k: Int)    = 96L + 100L * k
  private def dsHeaderAddr(k: Int) = 100L + 100L * k
  private val GHeapAddr      = 996L
  private val GHeapSegAddr   = 1028L // GHeapAddr + 32-byte heap header
  private val GSnod0Addr     = 1108L
  private val GSnod1Addr     = 1436L
  private val GBtreeAddr     = 1764L
  private val GHeaderAddr    = 2308L
  private val ZRawAddr       = 2404L
  private val ZHeaderAddr    = 2408L
  private val RootHeapAddr   = 2504L
  private val RootHeapSeg    = 2536L
  private val RootSnodAddr   = 2560L
  private val RootBtreeAddr  = 2888L
  private val RootHeaderAddr = 3432L
  private val Eof            = 3472L

  /** One contiguous scalar-ish i32 dataset object header (96 bytes):
    * v1 prefix + dataspace(rank 1, dims [1]) + datatype(i32 LE signed) +
    * layout(v3 contiguous at `dataAddr`, 4 bytes) — identical structure to
    * the first golden's dataset header, dims and size adjusted.
    */
  private def i32DatasetHeader(b: ByteBuffer, dataAddr: Long): Unit = {
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(3)    // dataspace + datatype + layout
    b.putInt(1)      // reference count
    b.putInt(80)     // body: (8+16) + (8+16) + (8+24)
    b.putInt(0)      // alignment pad
    // dataspace v1 (type 0x0001), rank 1, dims [1]
    b.putShort(0x0001); b.putShort(16)
    b.putInt(0)
    b.put(1.toByte); b.put(1.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(0)
    b.putLong(1L)
    // datatype v1 class 0 fixed-point (type 0x0003), 12 → 16 framing pad
    b.putShort(0x0003); b.putShort(16)
    b.putInt(0)
    b.put(0x10.toByte); b.put(0x08.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(4); b.putShort(0); b.putShort(32)
    b.putInt(0)
    // data layout v3 contiguous (type 0x0008), 18 → 24 framing pad
    b.putShort(0x0008); b.putShort(24)
    b.putInt(0)
    b.put(3.toByte); b.put(1.toByte)
    b.putLong(dataAddr)
    b.putLong(4L)
    b.putInt(0); b.putShort(0)
  }

  /** The expected image, built independently of Hdf5Writer. */
  private def expectedBytes: Array[Byte] = {
    val b = ByteBuffer.allocate(Eof.toInt).order(ByteOrder.LITTLE_ENDIAN)

    // ---- superblock v0 at 0 (spec II) --------------------------------
    b.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.put(0.toByte)   // shared header msg version
    b.put(8.toByte); b.put(8.toByte); b.put(0.toByte)
    b.putShort(4)     // group leaf node k
    b.putShort(16)    // group internal node k
    b.putInt(0)
    b.putLong(0L)     // base address
    b.putLong(Undef)  // free-space info
    b.putLong(Eof)    // end-of-file address
    b.putLong(Undef)  // driver info block
    b.putLong(0L)             // root STE: link name offset
    b.putLong(RootHeaderAddr) //           object header address
    b.putInt(0); b.putInt(0)  //           cache type 0, reserved
    b.putLong(0L); b.putLong(0L)

    // ---- g's nine datasets, depth-first: raw data + header each ------
    (0 until 9).foreach { k =>
      b.putInt(k + 1)               // raw [k+1] at 96 + 100k
      i32DatasetHeader(b, dsRawAddr(k))
    }

    // ---- g's local heap at 996 (spec III.D) --------------------------
    // segment: 8 reserved bytes, then "a".."i" NUL-terminated, each
    // 8-padded → name offsets 8, 16, …, 72; segment size 8 + 9·8 = 80
    b.put("HEAP".getBytes)
    b.putInt(0)
    b.putLong(80L)
    b.putLong(1L)          // free list head: 1 = none
    b.putLong(GHeapSegAddr)
    b.putLong(0L)          // 8 reserved segment bytes
    ('a' to 'i').foreach { c =>
      b.put(c.toByte); b.put(0.toByte); b.put(new Array[Byte](6))
    }

    // ---- g SNOD 0 at 1108 (spec III.C): FULL — 8 of 2·leaf_k slots ---
    b.put("SNOD".getBytes)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(8)
    (0 until 8).foreach { k =>
      b.putLong(8L + 8L * k)       // link name heap offset of "a"+k
      b.putLong(dsHeaderAddr(k))   // object header address
      b.putInt(0); b.putInt(0)     // cache type 0, reserved
      b.putLong(0L); b.putLong(0L) // scratch
    }

    // ---- g SNOD 1 at 1436: one entry ("i"), 7 capacity slots zeroed --
    b.put("SNOD".getBytes)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(1)
    b.putLong(72L)               // "i" heap offset
    b.putLong(dsHeaderAddr(8))
    b.putInt(0); b.putInt(0)
    b.putLong(0L); b.putLong(0L)
    b.put(new Array[Byte](7 * 40))

    // ---- g TREE v1 leaf at 1764 (spec III.A): TWO entries ------------
    // key invariant: key_0 ≤ names(child_0) ≤ key_1 ≤ names(child_1) ≤ key_2
    // key_0 = 0 (heap offset of "", smallest), key_1 = 64 ("h", the
    // largest name in SNOD 0), key_2 = 72 ("i")
    b.put("TREE".getBytes)
    b.put(0.toByte); b.put(0.toByte)
    b.putShort(2)     // entries used
    b.putLong(Undef); b.putLong(Undef)
    b.putLong(0L)           // key 0
    b.putLong(GSnod0Addr)   // child 0
    b.putLong(64L)          // key 1
    b.putLong(GSnod1Addr)   // child 1
    b.putLong(72L)          // key 2
    // used: 24-byte head + 3 keys + 2 children = 64; rest zeroed
    b.put(new Array[Byte](544 - 64))

    // ---- g object header at 2308: symbol table + attribute -----------
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(2)    // symbol table + attribute
    b.putInt(1)
    b.putInt(80)     // body: (8+16) + (8+48)
    b.putInt(0)
    b.putShort(0x0011); b.putShort(16)
    b.putInt(0)
    b.putLong(GBtreeAddr)
    b.putLong(GHeapAddr)
    // attribute v1 (type 0x000C, spec IV): name/datatype/dataspace sizes,
    // then each segment 8-aligned, then the raw value (no pad after)
    b.putShort(0x000C); b.putShort(48)
    b.putInt(0)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(9)    // name size: "NX_class" + NUL
    b.putShort(8)    // datatype size (fixed string of 7)
    b.putShort(8)    // dataspace size (scalar)
    b.put("NX_class".getBytes); b.put(0.toByte); b.put(new Array[Byte](7)) // 9 → 16
    b.put(0x13.toByte); b.put(0.toByte) // string dtype v1, null-term ASCII
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(7)                          // element size
    b.put(1.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // dataspace v1 rank 0
    b.putInt(0)
    b.put("NXentry".getBytes)            // 7 value bytes
    b.put(0.toByte)                      // framing pad 47 → 48

    // ---- dataset "z": raw [42] at 2404, header at 2408 ----------------
    b.putInt(42)
    i32DatasetHeader(b, ZRawAddr)

    // ---- root local heap at 2504: "g" at 8, "z" at 16 -----------------
    b.put("HEAP".getBytes)
    b.putInt(0)
    b.putLong(24L)
    b.putLong(1L)
    b.putLong(RootHeapSeg)
    b.putLong(0L)
    b.put('g'.toByte); b.put(0.toByte); b.put(new Array[Byte](6))
    b.put('z'.toByte); b.put(0.toByte); b.put(new Array[Byte](6))

    // ---- root SNOD at 2560: two entries of different node kinds -------
    b.put("SNOD".getBytes)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(2)
    b.putLong(8L);  b.putLong(GHeaderAddr) // "g" → the nested group
    b.putInt(0); b.putInt(0); b.putLong(0L); b.putLong(0L)
    b.putLong(16L); b.putLong(ZHeaderAddr) // "z" → the dataset
    b.putInt(0); b.putInt(0); b.putLong(0L); b.putLong(0L)
    b.put(new Array[Byte](6 * 40))

    // ---- root TREE v1 leaf at 2888: one entry -------------------------
    b.put("TREE".getBytes)
    b.put(0.toByte); b.put(0.toByte)
    b.putShort(1)
    b.putLong(Undef); b.putLong(Undef)
    b.putLong(0L)            // key 0
    b.putLong(RootSnodAddr)  // child 0
    b.putLong(16L)           // key 1: "z", largest root name
    b.put(new Array[Byte](544 - 48))

    // ---- root object header at 3432 -----------------------------------
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(1)
    b.putInt(1)
    b.putInt(24)
    b.putInt(0)
    b.putShort(0x0011); b.putShort(16)
    b.putInt(0)
    b.putLong(RootBtreeAddr)
    b.putLong(RootHeapAddr)

    assert(b.position() == Eof.toInt, s"builder ended at ${b.position()}")
    b.array()
  }

  private def writeFixture(): Array[Byte] = {
    val w    = new Hdf5Writer
    val path = Files.createTempDirectory("h5golden2").resolve("g2.h5").toString
    val nine = (0 until 9).map(k =>
      w.Dataset(('a' + k).toChar.toString, w.I32Data(Array(k + 1))))
    w.write(path, Seq(
      w.Group("g", nine, attrs = Seq("NX_class" -> w.StrAttr("NXentry"))),
      w.Dataset("z", w.I32Data(Array(42)))))
    Files.readAllBytes(Paths.get(path))
  }

  test("multi-SNOD nested tree matches the hand-built spec image byte-for-byte") {
    val actual   = writeFixture()
    val expected = expectedBytes
    assert(actual.length == expected.length,
      s"file size ${actual.length}, spec derivation says ${expected.length}")
    actual.indices.find(i => actual(i) != expected(i)).foreach { i =>
      fail(f"first drift from the spec image at offset $i%d (0x$i%x): " +
        f"wrote 0x${actual(i)}%02x, spec says 0x${expected(i)}%02x")
    }
  }

  test("landmark addresses sit where the allocation discipline derives them") {
    val bytes = writeFixture()
    val bb    = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def sig(at: Long) = new String(bytes.slice(at.toInt, at.toInt + 4))
    assert(sig(GHeapAddr) == "HEAP")
    assert(sig(GSnod0Addr) == "SNOD")
    assert(sig(GSnod1Addr) == "SNOD")
    assert(sig(GBtreeAddr) == "TREE")
    assert(sig(RootSnodAddr) == "SNOD")
    assert(sig(RootBtreeAddr) == "TREE")
    assert(bb.getLong(40) == Eof, "superblock EOF address")
    assert(bb.getShort(GSnod0Addr.toInt + 6) == 8, "SNOD 0 holds 8 symbols")
    assert(bb.getShort(GBtreeAddr.toInt + 6) == 2, "g B-tree holds 2 SNOD entries")
    assert(bb.getLong(GBtreeAddr.toInt + 40) == 64L, "separating key = offset of \"h\"")
  }

  test("the independent reader agrees with the same image") {
    val w    = new Hdf5Writer
    val path = Files.createTempDirectory("h5golden2").resolve("r2.h5").toString
    val nine = (0 until 9).map(k =>
      w.Dataset(('a' + k).toChar.toString, w.I32Data(Array(k + 1))))
    w.write(path, Seq(
      w.Group("g", nine, attrs = Seq("NX_class" -> w.StrAttr("NXentry"))),
      w.Dataset("z", w.I32Data(Array(42)))))
    val root = MiniHdf5Reader.read(path)
    val g = root.groups("g")
    assert(g.groups("i").datasets("").asInstanceOf[Array[Int]].toSeq == Seq(9))
    assert(g.groups("a").datasets("").asInstanceOf[Array[Int]].toSeq == Seq(1))
    assert(root.groups("z").datasets("").asInstanceOf[Array[Int]].toSeq == Seq(42))
  }
}
