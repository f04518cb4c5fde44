package graft.functions

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import graft.SparkSuite

/** MySqlWeek.weekMode1 vs an INDEPENDENT formulation of MySQL WEEK
  * mode 1 (week 1 = the Monday-first week containing Jan 4; days before
  * it are week 0; weeks count within the calendar year), plus hardcoded
  * values from the MySQL documentation.
  */
class MySqlWeekSpec extends SparkSuite {
  import spark.implicits._

  /** Reference implementation, deliberately different formulation. */
  private def mysqlWeek1(d: LocalDate): Int = {
    val jan4 = LocalDate.of(d.getYear, 1, 4)
    val week1Mon = jan4.minusDays(jan4.getDayOfWeek.getValue - 1L)
    if (d.isBefore(week1Mon)) 0
    else (ChronoUnit.DAYS.between(week1Mon, d) / 7 + 1).toInt
  }

  private def sparkWeek(dates: Seq[LocalDate]): Map[String, Int] =
    dates.map(_.toString).toDF("d")
      .select($"d", MySqlWeek.weekMode1(org.apache.spark.sql.functions.col("d").cast("date")).as("w"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("year-boundary days 1995-2025 match the independent mode-1 implementation") {
    val dates = for {
      y <- 1995 to 2025
      md <- (1 to 7).map(LocalDate.of(y, 1, _)) ++ (25 to 31).map(LocalDate.of(y, 12, _))
    } yield md
    val got = sparkWeek(dates)
    for (d <- dates)
      assert(got(d.toString) == mysqlWeek1(d), s"mismatch at $d")
  }

  test("documented MySQL examples") {
    // SELECT WEEK('2008-12-31',1) -> 53; WEEK('2000-01-01',1) -> 0
    // (Jan 1 2000 was a Saturday in the previous year's week);
    // WEEK('2008-02-20',1) -> 8
    val got = sparkWeek(Seq(
      LocalDate.of(2008, 12, 31), LocalDate.of(2000, 1, 1),
      LocalDate.of(2008, 2, 20), LocalDate.of(2019, 12, 30),
      LocalDate.of(2021, 1, 1)))
    assert(got("2008-12-31") == 53)
    assert(got("2000-01-01") == 0)
    assert(got("2008-02-20") == 8)
    assert(got("2019-12-30") == 53) // ISO says 2020-W01; MySQL counts within 2019
    assert(got("2021-01-01") == 0)  // ISO says 2020-W53; MySQL: before week 1
  }

  test("mart opt-in switches created_week to MySQL numbering") {
    val tweets = Seq((1L, java.sql.Timestamp.valueOf("2021-01-01 12:00:00")))
      .toDF("tweet_id", "created_at")
    val stats = Seq((1L, 5L)).toDF("tweet_id", "descendants")
    val iso = graft.mart.Mart.tweetsWide(tweets, stats)
      .select("created_week").head().getInt(0)
    val mysql = graft.mart.Mart.tweetsWide(tweets, stats, mysqlWeekParity = true)
      .select("created_week").head().getInt(0)
    assert(iso == 53)  // ISO: 2020-W53
    assert(mysql == 0) // MySQL mode 1: week 0 of 2021
  }
}
