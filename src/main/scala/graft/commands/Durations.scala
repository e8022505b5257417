package graft.commands

/** Duration-string parsing for job/CLI options — the reference accepts
  * `"10s" / "500ms" / "2m" / "1.5h" / bare seconds` via the regex callback
  * in `add_duration_option` (`apps/kafka-to-nexus.cpp:89-116`); semantics
  * mirrored exactly, including fractional values and round-to-nearest ms.
  */
object Durations {

  private val Pattern = """^(\d+\.?\d*)\s?(ms|min|m|h|sec|s)?$""".r

  /** Parse to milliseconds; None on anything the reference would reject. */
  def parseMs(input: String): Option[Long] = input.trim match {
    case Pattern(num, unit) =>
      val v = num.toDouble
      val ms = unit match {
        case null | "" | "s" | "sec" => v * 1000
        case "ms"                    => v
        case "m" | "min"             => v * 1000 * 60
        case "h"                     => v * 1000 * 60 * 60
      }
      Some(math.round(ms))
    case _ => None
  }
}
