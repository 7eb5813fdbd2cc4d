package graft.model

import org.apache.spark.sql.DataFrame

/** The engine's "table" bundle — long-format re-expression of the reference's
  * `Inventory` (reference: emiproc/inventories/__init__.py:75-149).
  *
  * - `emissions`: the gridded fact table, long format
  *   `(cell_id BIGINT, category STRING, substance STRING, value DOUBLE)`.
  *   The reference's wide `(Category, Substance)` MultiIndex columns
  *   (emiproc/inventories/__init__.py:91-95) become rows: at 100 TB the
  *   fact table is the only big relation — partition/bucket it by
  *   `cell_id`; category/substance are low-cardinality dictionary columns.
  * - `sources`: shaped sources (points/lines/boxes), the reference's `gdfs`
  *   dict (emiproc/inventories/__init__.py:96-101) flattened to rows:
  *   `(category, source_id, geom_kind, x, y, x2, y2, substance, value)`
  *   where geom_kind ∈ {point, line, box}; for `point` only (x,y) used,
  *   `line` is the segment (x,y)-(x2,y2), `box` the rectangle.
  * - `tProfiles` / `tIndex`: temporal profile table + index table (SURVEY
  *   §1.1); `vProfiles` / `vIndex`: vertical equivalents.
  * - `history`: operator lineage strings, like the reference's
  *   `inv.history` (emiproc/inventories/__init__.py:118).
  */
final case class Inventory(
    emissions: DataFrame,
    sources: Option[DataFrame] = None,
    grid: Option[RegularGrid] = None,
    tProfiles: Option[DataFrame] = None,
    tIndex: Option[DataFrame] = None,
    vProfiles: Option[DataFrame] = None,
    vIndex: Option[DataFrame] = None,
    year: Option[Int] = None,
    history: Vector[String] = Vector.empty) {

  def appendHistory(s: String): Inventory = copy(history = history :+ s)
}

object Inventory {
  val EmissionCols: Seq[String] = Seq("cell_id", "category", "substance", "value")
}
