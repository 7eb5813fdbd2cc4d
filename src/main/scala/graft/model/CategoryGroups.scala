package graft.model

/** The reference's published category-regroup mappings, shipped as
  * library data so `Grouping.groupCategories` can be called with the
  * official tables a switching user already relies on (reference
  * `emiproc/inventories/categories_groups.py:1-154`).
  *
  * These are data tables (Swiss inventory codes → GNFR sectors, TNO
  * sectors → GNFR), not code: values mirror the reference verbatim
  * because the mapping IS the spec.
  */
object CategoryGroups {

  /** Swiss national inventory categories → GNFR sectors
    * (categories_groups.py `CH_2_GNFR`). */
  val Ch2Gnfr: Map[String, Seq[String]] = Map(
    "GNFR_A" -> Seq("eipkv"),
    "GNFR_B" -> Seq("eipro", "eipwp", "eipzm"),
    "GNFR_C" -> Seq("ehare", "ehfho", "ehfoe", "ehgws", "eipdh", "eiprd", "elfeu"),
    "GNFR_D" -> Seq("eilgk", "eivgn", "evklm", "evtrk"),
    "GNFR_E" -> Seq("eilmi", "ehlmk"),
    "GNFR_F" -> Seq("evstr", "evzon"),
    "GNFR_G" -> Seq("evsee", "evsfa", "evsrh"),
    "GNFR_H" -> Seq("evfgva", "evfzrh"),
    "GNFR_I" -> Seq("ehmgh", "eibau", "eifrz", "eilpf", "eipis", "elfwm",
      "ellwm", "evsch", "evsra"),
    "GNFR_J" -> Seq("eidep", "eikla", "eikmp", "elabf", "elver"),
    "GNFR_K" -> Seq("elapp", "elsto"),
    "GNFR_L" -> Seq("elfer"),
    "GNFR_R" -> Seq("ehhab", "ehhaf", "ehhan", "enwal"))

  /** TNO GNFR sub-sectors → GNFR sectors (categories_groups.py
    * `TNO_2_GNFR`; road transport F splits into F1–F4). */
  val Tno2Gnfr: Map[String, Seq[String]] = Map(
    "GNFR_A" -> Seq("A"), "GNFR_B" -> Seq("B"), "GNFR_C" -> Seq("C"),
    "GNFR_D" -> Seq("D"), "GNFR_E" -> Seq("E"),
    "GNFR_F" -> Seq("F1", "F2", "F3", "F4"),
    "GNFR_G" -> Seq("G"), "GNFR_H" -> Seq("H"), "GNFR_I" -> Seq("I"),
    "GNFR_J" -> Seq("J"), "GNFR_K" -> Seq("K"), "GNFR_L" -> Seq("L"),
    "GNFR_R" -> Seq.empty)
}
