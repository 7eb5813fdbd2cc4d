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
}
