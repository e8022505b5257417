package graft.commands

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors `add_duration_option`'s accepted grammar
  * (`apps/kafka-to-nexus.cpp:89-116`).
  */
class DurationsSpec extends AnyFunSuite {
  test("unit suffixes parse to milliseconds like the reference") {
    assert(Durations.parseMs("10s").contains(10000L))
    assert(Durations.parseMs("10sec").contains(10000L))
    assert(Durations.parseMs("500ms").contains(500L))
    assert(Durations.parseMs("2m").contains(120000L))
    assert(Durations.parseMs("3 min").contains(180000L))
    assert(Durations.parseMs("1h").contains(3600000L))
    assert(Durations.parseMs("1.5h").contains(5400000L))
    assert(Durations.parseMs("10").contains(10000L))   // bare = seconds
    assert(Durations.parseMs("0.5s").contains(500L))
    assert(Durations.parseMs("0.4ms").contains(0L))    // round-to-nearest
  }
  test("garbage is rejected, not guessed") {
    assert(Durations.parseMs("abc").isEmpty)
    assert(Durations.parseMs("10x").isEmpty)
    assert(Durations.parseMs("-5s").isEmpty)
    assert(Durations.parseMs("").isEmpty)
  }
}
