package graft

import org.apache.spark.sql.functions._
import graft.functions.DateFns

/** MySQL TIMESTAMPDIFF edge-case semantics (complete periods,
  * day-of-month aware, truncation toward zero) — the constructs the
  * reference uses 83 times. Expected values follow MySQL behavior.
  */
class DateFnsSpec extends SparkSpec {

  private def eval(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                   a: String, b: String): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(f(col("a"), col("b")).as("r"))
      .head().getInt(0)
  }

  test("monthsBetween counts complete months (day-aware)") {
    // MySQL TIMESTAMPDIFF(MONTH, '2020-01-20', '2020-03-15') = 1
    assert(eval(DateFns.monthsBetween, "2020-01-20", "2020-03-15") === 1)
    // same day-of-month => exact month count
    assert(eval(DateFns.monthsBetween, "2020-01-15", "2020-03-15") === 2)
    // one day short of the month boundary
    assert(eval(DateFns.monthsBetween, "2020-01-15", "2020-03-14") === 1)
    // end-of-month: MySQL compares raw day-of-month (no clamping)
    assert(eval(DateFns.monthsBetween, "2020-01-31", "2020-02-29") === 0)
    assert(eval(DateFns.monthsBetween, "2020-01-31", "2020-03-31") === 2)
  }

  test("monthsBetween is sign-aware (reversed arguments negate)") {
    assert(eval(DateFns.monthsBetween, "2020-03-15", "2020-01-20") === -1)
    assert(eval(DateFns.monthsBetween, "2020-03-15", "2020-03-15") === 0)
    assert(eval(DateFns.monthsBetween, "2021-06-10", "2020-06-09") === -12)
  }

  test("monthsBetween differs from periodDiff exactly on day-of-month") {
    // periodDiff ignores days: Jan 20 -> Mar 15 is 2 periods, 1 complete month
    assert(eval((a, b) => DateFns.periodDiff(b, a), "2020-01-20", "2020-03-15") === 2)
    assert(eval(DateFns.monthsBetween, "2020-01-20", "2020-03-15") === 1)
  }

  test("weeksBetween truncates toward zero") {
    assert(eval(DateFns.weeksBetween, "2020-01-01", "2020-01-14") === 1)
    assert(eval(DateFns.weeksBetween, "2020-01-01", "2020-01-15") === 2)
    assert(eval(DateFns.weeksBetween, "2020-01-01", "2020-01-13") === 1)
    assert(eval(DateFns.weeksBetween, "2020-01-14", "2020-01-01") === -1)
    assert(eval(DateFns.weeksBetween, "2020-01-08", "2020-01-01") === -1)
  }
}
