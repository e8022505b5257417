package graft.streaming

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.TtlDedup.Doc

/** Retention-horizon dedup on `transformWithState`: first occurrence
  * admitted (keep-first within a batch), repeats suppressed while the
  * fingerprint's value state lives, re-admission after the TTL expires
  * it. Runs on the RocksDB state store (required by the API).
  */
class TtlDedupSpec extends SparkSpec {
  import spark.implicits._

  // transformWithState in ProcessingTime mode keeps requesting no-data
  // micro-batches (TTL/timer bookkeeping), so processAllAvailable never
  // settles with them enabled — and TTL expiry doesn't need them: it is
  // evaluated lazily against the batch timestamp on every state read
  private val confs = StatefulSessions.RocksDbStateStore +
    ("spark.sql.streaming.noDataMicroBatches.enabled" -> "false")

  private def withRocksDb(f: => Unit): Unit = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("first occurrence admitted, within-TTL repeats suppressed across batches") {
    withRocksDb {
      val stream = MemoryStream[Doc](spark)
      // TTL far above any batch-scheduling delay: this test pins the
      // SUPPRESSION semantics (expiry is pinned separately below, where
      // the clock is controlled with an explicit sleep)
      val query = TtlDedup.admitted(stream.toDS(), Duration.ofMinutes(10))
        .writeStream.format("memory").queryName("ttl_dedup")
        .outputMode("append").start()
      try {
        // batch 1: doc 2 and doc 5 share a canonical fingerprint
        // (whitespace/case differences) — keep-first admits doc 2
        stream.addData(
          Doc(5L, "Alpha  beta\tGAMMA"),
          Doc(2L, "alpha beta gamma"),
          Doc(3L, "delta epsilon"))
        query.processAllAvailable()
        // batch 2, well within the TTL: both fingerprints suppressed
        stream.addData(Doc(7L, "ALPHA BETA GAMMA"), Doc(8L, "delta  epsilon"))
        query.processAllAvailable()
        val got = spark.table("ttl_dedup").as[Doc].collect().map(_.doc_id).toSet
        assert(got == Set(2L, 3L), s"within-TTL admissions wrong: $got")
        // per-fingerprint state really is bounded: one row per live fp
        assert(query.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2L)
      } finally query.stop()
    }
  }

  test("TTL expiry re-admits the same content as a legitimate refresh") {
    withRocksDb {
      val stream = MemoryStream[Doc](spark)
      val query = TtlDedup.admitted(stream.toDS(), Duration.ofSeconds(2))
        .writeStream.format("memory").queryName("ttl_dedup_exp")
        .outputMode("append").start()
      try {
        stream.addData(Doc(1L, "alpha beta gamma"))
        query.processAllAvailable()
        // expiry is evaluated against the next batch's processing time on
        // every state read — sleep past the TTL with a loaded-machine margin
        Thread.sleep(4000)
        stream.addData(Doc(9L, "alpha beta gamma"))
        query.processAllAvailable()
        val got = spark.table("ttl_dedup_exp").as[Doc].collect().map(_.doc_id).toSet
        assert(got == Set(1L, 9L), s"post-TTL re-admission wrong: $got")
      } finally query.stop()
    }
  }

  test("the JVM fingerprint twin matches the column expression on corpus text") {
    // the keyed grouping uses fpOf; the batch/index layers use the
    // fingerprint Column — they must canonicalize identically or the
    // dedup layers stop composing
    import org.apache.spark.sql.functions._
    val docs = graft.core.Graft.documents(spark, "/root/testdata/sf0.001")
      .limit(300)
      .select(col("text"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .as[(String, String)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (text, fp) =>
      assert(TtlDedup.fpOf(text) == fp, s"fingerprint divergence on: $text")
    }
    // whitespace + case canonicalization agree too
    assert(TtlDedup.fpOf(" Alpha\t beta\n GAMMA ") == TtlDedup.fpOf("alpha beta gamma"))
  }

  test("fingerprint parity holds on control chars and non-ASCII text") {
    // adversarial canonicalization corners of crawled text: control
    // chars \s+ leaves alone but String.trim would strip (the 0x20-only
    // trim rule), unicode case mapping, CR/FF whitespace, emptiness
    val adversarial = Seq(
      "alpha beta",       // leading control char — NOT trimmed
      "alpha beta",       // trailing bell
      "   mixed  ", // control chars inside 0x20 padding
      "ÄÖÜ Straße ẞ",           // unicode lowercase incl. sharp-s forms
      "ΑΛΦΑ Βήτα",              // Greek case mapping
      "alpha\r\nbeta\fgamma",   // CR/LF/FF all \s
      " ",
      "")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val colSide = adversarial.toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .as[String].collect()
    adversarial.zip(colSide).foreach { case (text, fp) =>
      assert(TtlDedup.fpOf(text) == fp,
        s"fingerprint divergence on: ${text.map(c => f"\\u$c%04x").mkString}")
    }
  }

  test("a null text keys to the sentinel instead of crash-looping the query") {
    assert(TtlDedup.fpOf(null) == "")
    withRocksDb {
      val stream = MemoryStream[Doc](spark)
      val query = TtlDedup.admitted(stream.toDS(), Duration.ofMinutes(10))
        .writeStream.format("memory").queryName("ttl_dedup_null")
        .outputMode("append").start()
      try {
        stream.addData(Doc(1L, null), Doc(2L, "alpha"), Doc(3L, null))
        query.processAllAvailable() // would crash here on an executor NPE
        val got = spark.table("ttl_dedup_null").as[Doc].collect().map(_.doc_id).toSet
        // null-text docs share one TTL window (keep-first), like
        // dropDuplicates' null rule
        assert(got == Set(1L, 2L))
      } finally query.stop()
    }
  }
}
