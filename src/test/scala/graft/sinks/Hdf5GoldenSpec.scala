package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Byte-golden pin of [[Hdf5Writer]] against the PUBLIC HDF5 File Format
  * Specification — not against `MiniHdf5Reader` (which shares this repo
  * and could in principle drift in tandem with the writer).
  *
  * The fixture is the smallest meaningful file: a root group holding one
  * contiguous 1-D i32 dataset `d = [1, 2, 3]`. Every byte of the
  * expected image is HAND-BUILT here from the spec document, with each
  * structure's offset derived in the comments from the writer's
  * append-only allocation discipline (superblock placeholder first,
  * children before parents, heap → SNOD → B-tree → object header within
  * a group). If the writer drifts from the spec in ANY byte — a field
  * width, a signature, a padding rule, an address — this spec fails with
  * the first differing offset.
  *
  * Spec references (HDF5 File Format Specification, version 1.0/2.0
  * layout documents): superblock v0 (section II); local heap, symbol
  * table node, v1 B-tree (section III); v1 object header, dataspace,
  * datatype, layout, symbol-table and attribute messages (section IV).
  */
class Hdf5GoldenSpec extends AnyFunSuite {

  private val Undef = -1L

  /** Derived file map (every value hand-computed, see test bodies):
    *
    * | offset | size | structure                         |
    * |--------|------|-----------------------------------|
    * |      0 |   96 | superblock v0 (+ root STE)        |
    * |     96 |   12 | dataset raw data: 1,2,3 as i32 LE |
    * |    108 |   96 | dataset object header (3 msgs)    |
    * |    204 |   48 | local heap (32 hdr + 16 segment)  |
    * |    252 |  328 | SNOD (1 entry, padded to 2·k=8)   |
    * |    580 |  544 | TREE v1 leaf (1 entry, k=16 pad)  |
    * |   1124 |   40 | root group object header (1 msg)  |
    * |   1164 |      | end of file                       |
    */
  private val DataAddr       = 96L
  private val DsHeaderAddr   = 108L
  private val HeapAddr       = 204L
  private val HeapSegAddr    = 236L // HeapAddr + 32-byte heap header
  private val SnodAddr       = 252L
  private val BtreeAddr      = 580L
  private val RootHeaderAddr = 1124L
  private val Eof            = 1164L

  /** The expected image, built independently of Hdf5Writer. */
  private def expectedBytes: Array[Byte] = {
    val b = ByteBuffer.allocate(Eof.toInt).order(ByteOrder.LITTLE_ENDIAN)

    // ---- superblock v0 at 0 (spec II: 13 fixed fields + root STE) ----
    b.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    b.put(0.toByte)   //  8 superblock version 0
    b.put(0.toByte)   //  9 free-space storage version 0
    b.put(0.toByte)   // 10 root group symbol table version 0
    b.put(0.toByte)   // 11 reserved
    b.put(0.toByte)   // 12 shared header message format version 0
    b.put(8.toByte)   // 13 size of offsets
    b.put(8.toByte)   // 14 size of lengths
    b.put(0.toByte)   // 15 reserved
    b.putShort(4)     // 16 group leaf node k
    b.putShort(16)    // 18 group internal node k
    b.putInt(0)       // 20 file consistency flags
    b.putLong(0L)     // 24 base address
    b.putLong(Undef)  // 32 free-space info address (undefined)
    b.putLong(Eof)    // 40 end-of-file address
    b.putLong(Undef)  // 48 driver info block address (undefined)
    // root group symbol table entry (spec III: link, header, cache 0)
    b.putLong(0L)             // 56 link name offset
    b.putLong(RootHeaderAddr) // 64 object header address
    b.putInt(0)               // 72 cache type 0
    b.putInt(0)               // 76 reserved
    b.putLong(0L); b.putLong(0L) // 80 scratch (16 bytes)

    // ---- raw dataset data at 96: contiguous i32 little-endian --------
    b.putInt(1); b.putInt(2); b.putInt(3)

    // ---- dataset object header v1 at 108 (spec IV.A) -----------------
    // prefix: version 1, reserved, message count, reference count,
    // header data size, 4-byte pad so the body is 8-aligned
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(3)    // dataspace + datatype + layout
    b.putInt(1)      // reference count
    b.putInt(80)     // body: (8+16) + (8+16) + (8+24) = 80
    b.putInt(0)      // alignment pad
    // message 1 at 124: dataspace v1 (type 0x0001), rank 1, dims [3]
    b.putShort(0x0001); b.putShort(16)
    b.putInt(0)      // flags + 3 reserved
    b.put(1.toByte)  // dataspace version 1
    b.put(1.toByte)  // rank 1
    b.put(0.toByte)  // flags: no maxdims
    b.put(0.toByte); b.putInt(0) // reserved
    b.putLong(3L)    // dimension 0 = 3 elements
    // message 2 at 148: datatype v1 class 0 fixed-point (type 0x0003),
    // 12 spec bytes padded to 16 in the header framing
    b.putShort(0x0003); b.putShort(16)
    b.putInt(0)
    b.put(0x10.toByte) // version 1 << 4 | class 0
    b.put(0x08.toByte) // bits: little-endian, signed 2's complement
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(4)        // element size
    b.putShort(0)      // bit offset
    b.putShort(32)     // precision
    b.putInt(0)        // framing pad 12 → 16
    // message 3 at 172: data layout v3 contiguous (type 0x0008)
    b.putShort(0x0008); b.putShort(24)
    b.putInt(0)
    b.put(3.toByte)    // layout version 3
    b.put(1.toByte)    // layout class 1: contiguous
    b.putLong(DataAddr)
    b.putLong(12L)     // data size: 3 × 4 bytes
    b.putInt(0); b.putShort(0) // message padded 18 → 24

    // ---- root group's local heap at 204 (spec III.D) -----------------
    b.put("HEAP".getBytes)
    b.putInt(0)           // version 0 + 3 reserved
    b.putLong(16L)        // data segment size
    b.putLong(1L)         // free list head: 1 = none
    b.putLong(HeapSegAddr)
    // segment: 8 reserved bytes, then "d\0" at heap offset 8, 8-padded
    b.putLong(0L)
    b.put('d'.toByte); b.put(0.toByte)
    b.put(new Array[Byte](6))

    // ---- SNOD at 252 (spec III.C): fixed 8 + 2·leaf_k·40 = 328 ------
    b.put("SNOD".getBytes(): Array[Byte])
    b.put(1.toByte); b.put(0.toByte) // version 1, reserved
    b.putShort(1)                    // symbols used
    b.putLong(8L)                    // entry 0: link name heap offset
    b.putLong(DsHeaderAddr)          //          object header address
    b.putInt(0); b.putInt(0)         //          cache type 0, reserved
    b.putLong(0L); b.putLong(0L)     //          scratch
    b.put(new Array[Byte](7 * 40))   // 7 unused capacity slots, zeroed

    // ---- TREE v1 leaf at 580 (spec III.A): fixed 544 bytes -----------
    // 24-byte head + (2·internal_k + 1) keys + 2·internal_k children
    b.put("TREE".getBytes(): Array[Byte])
    b.put(0.toByte)   // node type 0: group
    b.put(0.toByte)   // level 0: leaf
    b.putShort(1)     // entries used
    b.putLong(Undef)  // left sibling
    b.putLong(Undef)  // right sibling
    b.putLong(0L)     // key 0: heap offset of "" (smallest name)
    b.putLong(SnodAddr) // child 0
    b.putLong(8L)       // key 1: heap offset of SNOD 0's largest name
    b.put(new Array[Byte](544 - 48)) // unused key/child slots, zeroed

    // ---- root group object header v1 at 1124 -------------------------
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(1)    // one message: symbol table
    b.putInt(1)      // reference count
    b.putInt(24)     // body: 8 + 16
    b.putInt(0)      // alignment pad
    b.putShort(0x0011); b.putShort(16) // symbol table message
    b.putInt(0)
    b.putLong(BtreeAddr)
    b.putLong(HeapAddr)

    assert(b.position() == Eof.toInt, s"builder ended at ${b.position()}")
    b.array()
  }

  private def writeFixture(): Array[Byte] = {
    val w    = new Hdf5Writer
    val path = Files.createTempDirectory("h5golden").resolve("g.h5").toString
    w.write(path, Seq(w.Dataset("d", w.I32Data(Array(1, 2, 3)))))
    Files.readAllBytes(Paths.get(path))
  }

  test("minimal file matches the hand-built spec image byte-for-byte") {
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
    assert(sig(HeapAddr) == "HEAP")
    assert(sig(SnodAddr) == "SNOD")
    assert(sig(BtreeAddr) == "TREE")
    assert(bb.getLong(40) == Eof,          "superblock EOF address")
    assert(bb.getLong(64) == RootHeaderAddr, "root STE header address")
    assert(bb.getInt(DataAddr.toInt) == 1, "raw data begins at 96")
  }

  test("the independent reader agrees with the same image") {
    val w    = new Hdf5Writer
    val path = Files.createTempDirectory("h5golden").resolve("r.h5").toString
    w.write(path, Seq(w.Dataset("d", w.I32Data(Array(1, 2, 3)))))
    val root = MiniHdf5Reader.read(path)
    assert(root.groups("d").datasets("").asInstanceOf[Array[Int]].toSeq ==
      Seq(1, 2, 3))
  }
}
