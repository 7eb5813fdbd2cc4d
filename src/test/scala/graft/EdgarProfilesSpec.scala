package graft

import org.apache.spark.sql.functions._
import graft.sources.EdgarProfiles

/** EDGAR auxiliary profile readers on the committed fixtures
  * (emiproc/inventories/edgar/temporal.py:26-171 semantics). */
class EdgarProfilesSpec extends SparkSpec {

  private val dir = "fixtures/edgar_profiles"

  test("weekly profiles: Weekday_id 1-7 -> dow0, per-country factors") {
    val w = EdgarProfiles.weeklyProfiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(w.size == 14)
    assert(w(("CHE", 0)) == 11.0 && w(("CHE", 6)) == 17.0)
    assert(w(("EGY", 3)) == 24.0)
  }

  test("hour-of-week-per-month: weekend types route day types per country") {
    val p = EdgarProfiles.hourOfWeekPerMonthProfiles(spark, dir)
    val rows = p.collect()
      .map(r => (r.getString(0), r.getInt(2)) -> r.getDouble(3)).toMap
    // 2 countries x 1 category x 2 months x 168 positions
    assert(rows.size == 2 * 2 * 168)
    // ratios normalize per (country, category)
    val sums = p.groupBy("country").agg(sum("ratio")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(sums("CHE") - 1.0) < 1e-9)
    assert(math.abs(sums("EGY") - 1.0) < 1e-9)
    // CHE (weekend type 1): Friday (dow0=4) is a weekday -> daytype 1,
    // Saturday (dow0=5) -> daytype 2. EGY (type 2): Friday -> daytype 2,
    // Saturday -> daytype 3, Sunday (dow0=6) -> daytype 1.
    // factor(daytype, hour i) = daytype*100 + i; compare via RATIOS of
    // positions inside the same (country, month) so normalization cancels.
    def at(c: String, dow0: Int, hour0: Int, month: Int = 1) =
      rows((c, (month - 1) * 168 + dow0 * 24 + hour0))
    // same country: Friday-hour1 vs Monday-hour1
    assert(math.abs(at("CHE", 4, 0) / at("CHE", 0, 0) - 101.0 / 101.0) < 1e-12)
    assert(math.abs(at("CHE", 5, 0) / at("CHE", 0, 0) - 201.0 / 101.0) < 1e-12)
    assert(math.abs(at("EGY", 4, 0) / at("EGY", 0, 0) - 201.0 / 101.0) < 1e-12)
    assert(math.abs(at("EGY", 5, 0) / at("EGY", 0, 0) - 301.0 / 101.0) < 1e-12)
    assert(math.abs(at("EGY", 6, 0) / at("EGY", 0, 0) - 1.0) < 1e-12)
    // month 2 fills the second 168-slot block with the same pattern
    assert(math.abs(at("CHE", 5, 3, month = 2) / at("CHE", 0, 3, month = 2)
      - 204.0 / 104.0) < 1e-12)
  }

  test("separator sniffing: ';' and ',' files both parse") {
    assert(EdgarProfiles.sniffSep(s"$dir/weekly_profiles.csv") == ";")
    assert(EdgarProfiles.sniffSep(s"$dir/hourly_profiles.csv") == ",")
  }
}
