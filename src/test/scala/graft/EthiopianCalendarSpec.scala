package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EthiopianCalendar

class EthiopianCalendarSpec extends AnyFunSuite {
  import EthiopianCalendar._

  // Public anchor dates (Ethiopian New Year falls on Sept 11, or
  // Sept 12 the year after an Ethiopian leap year).
  test("known anchors") {
    assert(toEthiopian(LocalDate.of(2022, 9, 11)) == ((2015, 1, 1)))
    assert(toEthiopian(LocalDate.of(2023, 9, 12)) == ((2016, 1, 1)))
    assert(toEthiopian(LocalDate.of(2024, 1, 10)) == ((2016, 5, 1)))  // Tir 1
    assert(toEthiopian(LocalDate.of(2024, 1, 21)) == ((2016, 5, 12))) // Tir 12
    assert(toGregorian(2016, 1, 1) == LocalDate.of(2023, 9, 12))
  }

  test("pagume leap day") {
    // 2015 EC is leap (2015 % 4 == 3): Pagume has 6 days, the 6th is
    // the day before new year 2016 = 2023-09-11.
    assert(toEthiopian(LocalDate.of(2023, 9, 11)) == ((2015, 13, 6)))
    assert(toGregorian(2015, 13, 6) == LocalDate.of(2023, 9, 11))
  }

  test("roundtrip over 60 years of days") {
    var d = LocalDate.of(1990, 1, 1)
    val end = LocalDate.of(2050, 1, 1)
    while (d.isBefore(end)) {
      val (y, m, dd) = toEthiopian(d)
      assert(m >= 1 && m <= 13 && dd >= 1 && dd <= 30)
      assert(toGregorian(y, m, dd) == d, s"roundtrip failed at $d")
      d = d.plusDays(1)
    }
  }

  test("report window matches export.py month rule") {
    // export.py:360-375 — window for Ethiopian month m/year y is
    // [21st of previous Ethiopian month, 20th of m], Meskerem wraps
    // to Pagume of the previous year.
    val (s1, e1) = reportWindow(5, 2016) // Tir 2016
    assert(e1 == toGregorian(2016, 5, 20))
    assert(s1 == toGregorian(2016, 4, 21))
    val (s2, e2) = reportWindow(1, 2016) // Meskerem wraps
    assert(s2 == toGregorian(2015, 13, 21))
    assert(e2 == toGregorian(2016, 1, 20))
  }
}
