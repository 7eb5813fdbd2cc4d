package graft.model

/** The Zurich inventory's published CO2 fossil/biogenic split ratios
  * (reference `emiproc/inventories/zurich/speciation_co2_bio.py:4-73`):
  * per-category biogenic FRACTION of CO2; the reference builds the
  * speciation array as [r, 1 - r] over (CO2_bio, CO2_fos) — mirrored by
  * [[graft.ops.Speciation.co2BioTable]]. Data table, not code: the
  * values ARE the spec (incl. the 0.52 waste-incinerator split and the
  * 0.023984 road-transport biofuel share from the Swiss inventory).
  */
object ZurichData {

  val Co2BioRatios: Map[String, Double] = Map(
    "c2201_BHKW_Emissionen_Kanton" -> 0.0,
    "c2301_KHKWKehricht_Emissionen_Kanton" -> 0.52,
    "c2302_KHKWErdgas_Emissionen_Kanton" -> 0.0,
    "c2303_KHKWHeizoel_Emissionen_Kanton" -> 0.0,
    "c3201_Notstromanlagen_Emissionen_Kanton" -> 0.0,
    "c3301_Prozessenergie_Emissionen_Kanton" -> 0.0,
    "c3401_Metallreinigung_Emissionen_Kanton" -> 0.0,
    "c3402_Holzbearbeitung_Emissionen_Kanton" -> 0.0,
    "c3403_Malereien_Emissionen_Kanton" -> 0.0,
    "c3404_Textilreinigung_Emissionen_Kanton" -> 0.0,
    "c3405_Karosserien_Emissionen_Kanton" -> 0.0,
    "c3406_Raeuchereien_Emissionen_Kanton" -> 0.0,
    "c3407_Roestereien_Emissionen_Kanton" -> 0.0,
    "c3408_Druckereien_Emissionen_Kanton" -> 0.0,
    "c3409_Laboratorien_Emissionen_Kanton" -> 0.0,
    "c3410_Bierbrauereien_Emissionen_Kanton" -> 1.0,
    "c3411_Brotproduktion_Emissionen_Kanton" -> 0.0,
    "c3412_MedizinischePraxen_Emissionen_Kanton" -> 0.0,
    "c3413_Gesundheitswesen_Emissionen_Kanton" -> 0.0,
    "c2101_Oelheizungen_Emissionen_Kanton" -> 0.0,
    "c2102_Gasheizungen_Emissionen_Kanton" -> 0.0,
    "c2103_HolzheizungenLokalisiert_Emissionen_Kanton" -> 1.0,
    "c2104_HolzheizungenDispers_Emissionen_Kanton" -> 1.0,
    "c2105_Warmwassererzeuger_Emissionen_Kanton" -> 0.0,
    "c3416_Tankstellen_Emissionen_Kanton" -> 0.0,
    "c3417_LoesemittelIG_Emissionen_Kanton" -> 0.0,
    "c5101_LoesemittelHH_Emissionen_Kanton" -> 0.0,
    "c1301_Personenwagen_Emissionen_Kanton" -> 0.023984,
    "c1302_Lastwagen_Emissionen_Kanton" -> 0.023984,
    "c1303_Motorraeder_Emissionen_Kanton" -> 0.023984,
    "c1304_Linienbusse_Emissionen_Kanton" -> 0.023984,
    "c1305_Trolleybusse_Emissionen_Kanton" -> 0.023984,
    "c1306_StartStopTankatmung_Emissionen_Kanton" -> 0.020611,
    "c1307_Lieferwagen_Emissionen_Kanton" -> 0.023984,
    "c1308_Reisebusse_Emissionen_Kanton" -> 0.023984,
    "c1101_Linienschiffe_Emissionen_Kanton" -> 0.0,
    "c1102_PrivaterBootsverkehr_Emissionen_Kanton" -> 0.0,
    "c1201_BahnPersonenverkehr_Emissionen_Kanton" -> 0.0,
    "c1202_BahnGueterverkehr_Emissionen_Kanton" -> 0.0,
    "c1203_Tramverkehr_Emissionen_Kanton" -> 0.0,
    "c1204_Kleinbahnen_Emissionen_Kanton" -> 0.0,
    "c3101_MaschinenHochbau_Emissionen_Kanton" -> 0.0,
    "c3102_Bitumen_Emissionen_Kanton" -> 0.0,
    "c3103_FarbenBaustelle_Emissionen_Kanton" -> 0.0,
    "c3104_MaschinenTiefbau_Emissionen_Kanton" -> 0.0,
    "c3105_Strassenbelag_Emissionen_Kanton" -> 0.0,
    "c3419_IndustrielleFZ_Emissionen_Kanton" -> 0.0,
    "c4101_ForstwirtschaftlicheFZ_Emissionen_Kanton" -> 0.0,
    "c4201_LandwirtschaftlicheFZ_Emissionen_Kanton" -> 0.0,
    "c2401_Klaerschlammverwertung_Emissionen_Kanton" -> 0.0,
    "c3418_Vergaerwerk_Emissionen_Kanton" -> 0.0,
    "c3414_Krematorium_Emissionen_Kanton" -> 0.0,
    "c5201_Gruenabfallverbrennung_Emissionen_Kanton" -> 1.0,
    "c5301_HolzoefenKleingarten_Emissionen_Kanton" -> 1.0,
    "c5401_AbfallverbrennungHaus_Emissionen_Kanton" -> 0.0,
    "c4401_Nutztierhaltung_Emissionen_Kanton" -> 1.0,
    "c4301_Nutzflaechen_Emissionen_Kanton" -> 0.0,
    "c5501_HausZooZirkustiere_Emissionen_Kanton" -> 1.0,
    "c5601_Feuerwerke_Emissionen_Kanton" -> 0.0,
    "c5701_Tabakwaren_Emissionen_Kanton" -> 1.0,
    "c5801_BrandFeuerschaeden_Emissionen_Kanton" -> 0.5,
    "c6101_Waelder_Emissionen_Kanton" -> 1.0,
    "c6201_Grasflaechen_Emissionen_Kanton" -> 0.0,
    "c6301_Gewaesser_Emissionen_Kanton" -> 0.0,
    "c6401_Blitze_Emissionen_Kanton" -> 0.0)
}
