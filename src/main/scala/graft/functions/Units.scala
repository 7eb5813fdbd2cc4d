package graft.functions

import org.apache.spark.sql.Column

/** Emission unit conversions — the reference's `Units` enum +
  * `get_scaling_factor_to_emiproc` (emiproc/utilities.py:49-59,
  * emiproc/utils/units.py:11-64) and the raster export conversions
  * (emiproc/exports/rasters.py:95-108). The engine-internal unit is
  * kg/y/cell; conversions are pure Column arithmetic. */
object Units {

  val SecPerYear: Double = 365.25 * 86400.0

  /** kg/y/cell → kg m⁻² s⁻¹ (CF flux) for a given cell area in m². */
  def kgPerYearToFlux(v: Column, cellAreaM2: Double): Column =
    v / (cellAreaM2 * SecPerYear)

  /** kg m⁻² s⁻¹ → kg/y/cell. */
  def fluxToKgPerYear(flux: Column, cellAreaM2: Double): Column =
    flux * (cellAreaM2 * SecPerYear)

  /** kg/y/cell → µg m⁻² s⁻¹. */
  def kgPerYearToMicrogFlux(v: Column, cellAreaM2: Double): Column =
    kgPerYearToFlux(v, cellAreaM2) * 1e9

  /** kg/h → kg/y. */
  def kgPerHourToKgPerYear(v: Column): Column = v * (SecPerYear / 3600.0)

  /** t/y → kg/y. */
  def tonPerYearToKgPerYear(v: Column): Column = v * 1000.0

  /** kg/y → mol/y for a molar mass in g/mol (reference WRF export,
    * emiproc/exports/wrf.py:129-240 + utils/constants.py:22). */
  def kgPerYearToMolPerYear(v: Column, molarMassGPerMol: Double): Column =
    v * (1000.0 / molarMassGPerMol)

  // ---- reference constants (emiproc/utils/constants.py:1-8)
  val DayPerYear: Double = 365.25
  val SecPerDay: Double = 86400.0

  /** Molar masses in g/mol — the reference table verbatim
    * (utils/constants.py:11-19, incl. its two test substances). */
  val MolarMasses: Map[String, Double] = Map(
    "CH4" -> 16.04, "CO2" -> 44.009, "N2O" -> 44.013, "C" -> 12.01,
    "test" -> 1.0, "test2" -> 2.0)

  /** Reference `get_molar_mass` (utils/constants.py:22-29): errors on an
    * unknown substance instead of guessing. */
  def molarMass(substance: String): Double =
    MolarMasses.getOrElse(substance, throw new IllegalArgumentException(
      s"Unknown molar mass for substance `$substance`. " +
        "Please add it to Units.MolarMasses."))

  /** Reference `get_scaling_factor_to_emiproc`
    * (emiproc/utils/units.py:11-46): factor from `unit` to the internal
    * kg/year/cell, plus whether the value must also be multiplied by the
    * cell area. PgC/yr is CO2-only; unsupported units error. */
  def scalingFactorToEmiproc(
      unit: String, substance: Option[String] = None): (Double, Boolean) =
    unit match {
      case "kg/m2/s" => (DayPerYear * SecPerDay, true)
      case "kg/year/m2" => (1.0, true)
      case "kg/y/cell" | "kg y-1 cell-1" | "kg/year/cell" => (1.0, false)
      case "PgC/yr" =>
        require(substance.contains("CO2"),
          "PgC/yr unit can only be used for CO2 substance.")
        (1e12 * (molarMass("CO2") / molarMass("C")), false)
      case "micromol/m2/s" =>
        val mm = molarMass(substance.getOrElse(
          throw new IllegalArgumentException(
            "micromol/m2/s needs a substance for its molar mass")))
        (1e-3 * mm * 1e-6 * SecPerDay * DayPerYear, true)
      case other => throw new NotImplementedError(
        s"Unit $other not supported. Please implement in Units.scalingFactorToEmiproc.")
    }
}
