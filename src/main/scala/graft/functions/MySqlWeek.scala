package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL `WEEK(d, 1)` parity (mode 1: Monday-first, range 0..53, week 1
  * is the first week with 4+ days in the year) — the exact week
  * numbering the reference mart stores (`4_create_tweets_a.py:43`,
  * MariaDB `WEEK(created_at, 1)`).
  *
  * Relation to ISO `weekofyear`: identical except at year boundaries —
  * early-January days that ISO assigns to the PREVIOUS year's week 52/53
  * are week 0 in MySQL mode 1, and late-December days that ISO assigns
  * to NEXT year's week 1 are week 53 (MySQL counts within the calendar
  * year instead of wrapping). A year whose last days wrap forward always
  * has 52 complete weeks, so the wrapped value is always 53.
  *
  * Pure built-in composition (no UDF): the ISO week-year is the year of
  * the Thursday of d's Monday-first week — `weekday(d)` is 0 for Monday,
  * so that Thursday is `date_add(d, 3 - weekday(d))`.
  */
object MySqlWeek {

  def weekMode1(d: Column): Column = {
    val isoYear = year(date_add(d, lit(3) - weekday(d)))
    when(isoYear < year(d), lit(0))
      .when(isoYear > year(d), lit(53))
      .otherwise(weekofyear(d))
  }
}
