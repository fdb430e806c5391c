package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GTFS time-of-day codecs (SURVEY.md §2.4 X2–X4, §7.4 hard part #2).
  *
  * GTFS times may exceed 24:00 ("25:10:00" = 1:10 am next service day,
  * generate_gtfs.py:295-306), so these are integer-seconds codecs — never
  * timestamp types, never from_unixtime (which wraps at 24 h).
  */
object timecodec {

  private val TimePattern = "^\\d+:\\d{2}(:\\d{2})?$"

  /** X2/X4: "HH:MM[:SS]" → seconds since service midnight; hours may be
    * ≥ 24; anything non-time-shaped → 0 (reference parse_time tolerance).
    */
  def timeToSec(c: Column): Column = {
    val parts = split(c, ":")
    when(c.rlike(TimePattern),
      parts.getItem(0).cast("int") * 3600 +
        parts.getItem(1).cast("int") * 60 +
        coalesce(try_element_at(parts, lit(3)).cast("int"), lit(0)))
      .otherwise(lit(0))
  }

  /** X3: seconds → "HH:MM:SS" with hours allowed past 24, rounded to the
    * nearest second first (generate_gtfs.py:31-38). Python round() is
    * banker's rounding, hence bround (half-even), not round (half-up).
    */
  def secToTime(c: Column): Column = {
    val s = bround(c).cast("bigint")
    format_string("%02d:%02d:%02d",
      (s / 3600).cast("bigint"), ((s % 3600) / 60).cast("bigint"), s % 60)
  }
}
