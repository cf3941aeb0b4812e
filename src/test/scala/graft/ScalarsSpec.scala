package graft

import graft.functions.Scalars
import org.apache.spark.sql.functions._

/** F-function edge cases, esp. the calendar-age boundary matrix. */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def age(birth: String, asOf: String): Long =
    Seq(birth).toDF("b")
      .select(Scalars.ageAt(col("b").cast("date"), lit(asOf).cast("date")))
      .as[Long].collect()(0)

  test("ageAt: birthday not yet reached this year → one less") {
    assert(age("2000-06-15", "2024-06-14") == 23L)
    assert(age("2000-06-15", "2024-06-15") == 24L) // birthday itself counts
    assert(age("2000-06-15", "2024-06-16") == 24L)
  }

  test("ageAt: leap-day birthday") {
    assert(age("2000-02-29", "2023-02-28") == 22L) // Feb 28: not yet
    assert(age("2000-02-29", "2023-03-01") == 23L)
    assert(age("2000-02-29", "2024-02-29") == 24L)
  }

  test("gender decode uses neutral default") {
    val out = Seq("F", "M", "X", null).toDF("g")
      .select(Scalars.genderLabel(col("g"))).as[String].collect().toSeq
    assert(out == Seq("female", "male", "other", "other"))
  }

  test("millis round-trip keeps date and hour") {
    val out = Seq(1645429962000L).toDF("ms")
      .select(Scalars.millisToDate(col("ms")), Scalars.millisToHour(col("ms")))
      .as[(String, String)].collect()(0)
    assert(out == (("2022-02-21", "07"))) // UTC
  }

  test("splitDate/splitHour on 'yyyy-MM-dd HH:mm:ss' strings (F3)") {
    val out = Seq("2022-02-21 07:12:42").toDF("s")
      .select(Scalars.splitDate(col("s")), Scalars.splitHour(col("s")))
      .as[(String, String)].collect()(0)
    assert(out == (("2022-02-21", "07")))
  }
}
