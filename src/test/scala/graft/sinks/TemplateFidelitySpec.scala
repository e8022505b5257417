package graft.sinks

import java.nio.file.{Files, Paths}

import org.json4s._

import graft.SparkSpec
import graft.plans.NexusPlan

/** Structural fidelity audit: EVERY reference template
  * (all five under `domain-tests/nexus_templates/`) walked through
  * FileMaker → Hdf5Export → the in-repo reader, asserting that every plan
  * node lands — every group with every declared attribute, every static
  * dataset with its values and attributes, every link resolving to a copy
  * of its target — not just the datasets the per-module goldens happen to
  * cover. Motivated by the r13 B-tree fix: structural gaps can hide in
  * the writer wherever a golden doesn't look.
  */
class TemplateFidelitySpec extends SparkSpec {

  private val refRoot = "/root/reference/domain-tests"

  private val templates = Seq(
    "buffered", "messages_before_and_after", "repeated_messages",
    "static_information", "writer_modules")

  /** Navigate the exported tree by a plan path like `entry/instrument/x`. */
  private def walk(root: MiniHdf5Reader.Obj, path: String): Option[MiniHdf5Reader.Obj] =
    path.split('/').filter(_.nonEmpty)
      .foldLeft(Option(root))((o, seg) => o.flatMap(_.groups.get(seg)))

  /** Flatten a JSON values tree (scalar or arbitrarily nested arrays) to a
    * leaf sequence in row-major order — the shape HDF5 datasets store.
    */
  private def leaves(jv: JValue): Seq[Any] = jv match {
    case JArray(xs)  => xs.flatMap(leaves)
    case JString(s)  => Seq(s)
    case JInt(i)     => Seq(i.toLong)
    case JLong(l)    => Seq(l)
    case JDouble(d)  => Seq(d)
    case JDecimal(d) => Seq(d.toDouble)
    case JBool(b)    => Seq(if (b) 1L else 0L)
    case _           => Nil
  }

  /** Exported value (scalar or Array of any element type) to leaves. */
  private def exportedLeaves(v: Any): Seq[Any] = v match {
    case a: Array[_] => a.toSeq
    case x           => Seq(x)
  }

  /** Tolerant scalar equality: strings exactly; numbers numerically, with
    * relative tolerance for the float32 paths (JSON doubles narrow to f32
    * in `float`-typed datasets, so bit equality is not the contract).
    */
  private def scalarEq(expected: Any, actual: Any): Boolean = (expected, actual) match {
    case (e: String, a: String) => e == a
    case (e, a) =>
      val en = e match { case n: Number => n.doubleValue(); case _ => return false }
      val an = a match { case n: Number => n.doubleValue(); case _ => return false }
      en == an || math.abs(en - an) <= 1e-6 * math.max(math.abs(en), math.abs(an))
  }

  private def assertValues(where: String, expected: JValue, actual: Any): Unit = {
    val e = leaves(expected)
    val a = exportedLeaves(actual)
    assert(e.size == a.size, s"$where: ${e.size} plan values vs ${a.size} exported")
    e.zip(a).zipWithIndex.foreach { case ((ev, av), i) =>
      assert(scalarEq(ev, av), s"$where[$i]: plan $ev vs exported $av")
    }
  }

  private def assertAttrs(where: String, specs: Seq[NexusPlan.AttributeSpec],
      attrs: Map[String, Any]): Unit =
    specs.foreach { at =>
      val got = attrs.get(at.name)
      assert(got.nonEmpty, s"$where: attribute '${at.name}' missing " +
        s"(present: ${attrs.keys.toSeq.sorted.mkString(",")})")
      assertValues(s"$where@${at.name}", at.values, got.get)
    }

  for (t <- templates)
    test(s"template '$t': every group attribute, static value, and link " +
      "target survives FileMaker → export → read") {
      assume(Files.exists(Paths.get(refRoot)), "reference checkout not present")
      val out = Files.createTempDirectory(s"graft-fid-$t").toString
      graft.FileMaker.run(
        spark,
        Files.readString(Paths.get(s"$refRoot/nexus_templates/${t}_template.json")),
        Files.readString(Paths.get(s"$refRoot/data_files/${t}_data.json")),
        out)
      val h5 = s"$out/fidelity.h5"
      Hdf5Export.export(spark, out, h5)
      val root = MiniHdf5Reader.read(h5)
      val plan = NexusPlan.parse(
        Files.readString(Paths.get(s"$refRoot/nexus_templates/${t}_template.json")))

      // every plan group exists with every declared attribute
      plan.groups.foreach { g =>
        val node = walk(root, g.path)
        assert(node.nonEmpty, s"group ${g.path} missing from export")
        assertAttrs(s"group ${g.path}", g.attributes, node.get.attrs)
      }

      // every static dataset: values + its own attributes (Node.path is
      // the FULL path including the dataset's own name)
      plan.statics.foreach { s =>
        val ds = walk(root, s.path)
          .getOrElse(fail(s"static ${s.path} missing from export"))
        assertValues(s"static ${s.path}", s.values, ds.datasets(""))
        assertAttrs(s"static ${s.path}", s.attributes, ds.attrs)
      }

      // every link materializes as a value copy of its (absolute or
      // relative) target — `HDFOperations::addLinkToNode` semantics
      plan.links.foreach { l =>
        val target =
          if (l.target.startsWith("/")) l.target
          else {
            // relative: resolve ../ segments against the link's group
            // (drop the link's own name from its full path first)
            val base = l.path.split('/').filter(_.nonEmpty).dropRight(1).toBuffer
            l.target.split('/').foreach {
              case ".." => if (base.nonEmpty) base.remove(base.size - 1)
              case seg if seg.nonEmpty && seg != "." => base += seg
              case _ => ()
            }
            base.mkString("/")
          }
        val linked = walk(root, l.path) // full path including the link name
          .getOrElse(fail(s"link ${l.path} missing from export"))
        val tgt = walk(root, target)
          .getOrElse(fail(s"link target $target missing from export"))
        assert(exportedLeaves(linked.datasets("")) == exportedLeaves(tgt.datasets("")),
          s"link ${l.path} values differ from target $target")
      }
    }
}
