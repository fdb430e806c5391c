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

  /** X2/X4: "HH:MM[:SS]" → seconds since service midnight; hours may be
    * ≥ 24; anything non-time-shaped → 0 (reference parse_time tolerance).
    * Native codegen kernel (graft.plans.TimeToSec), byte-equal to the
    * rlike + split + cast chain it replaced (TextKernelsSpec).
    */
  def timeToSec(c: Column): Column = graft.plans.TimeKernels.timeToSec(c)

  /** X3: seconds → "HH:MM:SS" with hours allowed past 24, rounded to the
    * nearest second first (generate_gtfs.py:31-38). Python round() is
    * banker's rounding, hence half-even, not half-up. Native codegen
    * kernel (graft.plans.SecToTime), byte-equal to
    * `format_string("%02d:%02d:%02d", bround(c)...)`.
    */
  def secToTime(c: Column): Column =
    graft.plans.TimeKernels.secToTime(c.cast("double"))
}
