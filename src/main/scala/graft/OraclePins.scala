package graft

/** Pinned-literal regression oracles for gate queries whose inputs are
  * committed byte fixtures (LoaderFixtures-generated; scale-factor
  * INDEPENDENT — verified identical at sf0.001 and sf0.01). The loaders
  * have no DuckDB-expressible relational form (NetCDF/HDF5/FileGDB/
  * PNG/WAV/Overpass-JSON byte decoding), so the oracle pins the verified
  * output values as SQL literals: the driver's hash compare then guards
  * schema, row count AND every value against regressions, where a
  * rows-only check guarded only non-emptiness. Value-level correctness
  * of each decode is established by the corresponding ScalaTest spec
  * (TnoSpec, GfasSpec, CamsRegSpec, LpjGuessSpec, GfedSpec, MapLuftSpec,
  * OsmSpec, JvmMediaSpec, WrfGridSpec, DuckInventorySpec,
  * EdgarProfilesSpec, WarcSpec, HtmlExtractSpec) and by
  * LoaderFixturesSpec's byte-drift guard. */
object OraclePins {
  val pins: Map[String, String] = Map(
    "q_cams" ->
      """SELECT * FROM (VALUES
      ('A', 'NOx', '625000000.0'::DOUBLE, 2::BIGINT),
      ('B', 'CH4', '1000000000.0'::DOUBLE, 2::BIGINT)
      ) AS t(category, substance, total, n_cells)""",
    "q_country_real" ->
      """SELECT * FROM (VALUES
      ('AUT', 192::BIGINT, 1::BIGINT, 1::BIGINT),
      ('CHE', 92::BIGINT, 1::BIGINT, 1::BIGINT),
      ('FRA', 1243::BIGINT, 1::BIGINT, 1::BIGINT),
      ('ITA', 307::BIGINT, 1::BIGINT, 1::BIGINT)
      ) AS t(country, n_cells, tz_hours, summertime)""",
    "q_duck_inventory" ->
      """SELECT * FROM (VALUES
      ('heating', 'ch4', 'point', 10::BIGINT, '90.0'::DOUBLE, 10::BIGINT),
      ('traffic', 'co2', 'polygon', 6::BIGINT, '33.0'::DOUBLE, 30::BIGINT),
      ('traffic', 'nox', 'polygon', 6::BIGINT, '8.5'::DOUBLE, 30::BIGINT)
      ) AS t(category, substance, kind, n, total, n_vertices)""",
    "q_edgar_dir" ->
      """SELECT * FROM (VALUES
      ('ENE', 'CH4', '3.221384972505391e+19'::DOUBLE, 6::BIGINT),
      ('ENE', 'CO2', '3.221384972505391e+19'::DOUBLE, 6::BIGINT),
      ('TRO', 'CH4', '3.221384972505391e+19'::DOUBLE, 6::BIGINT),
      ('TRO', 'CO2', '3.221384972505391e+19'::DOUBLE, 6::BIGINT)
      ) AS t(category, substance, total, n_cells)""",
    // q_edgar_dsv2: the DataSource V2 read path must reproduce
    // q_edgar_dir's rows exactly — same pinned values.
    "q_edgar_dsv2" ->
      """SELECT * FROM (VALUES
      ('ENE', 'CH4', '3.221384972505391e+19'::DOUBLE, 6::BIGINT),
      ('ENE', 'CO2', '3.221384972505391e+19'::DOUBLE, 6::BIGINT),
      ('TRO', 'CH4', '3.221384972505391e+19'::DOUBLE, 6::BIGINT),
      ('TRO', 'CO2', '3.221384972505391e+19'::DOUBLE, 6::BIGINT)
      ) AS t(category, substance, total, n_cells)""",
    // q_edgar_dsv2_pushdown: the file-pruned scan must produce exactly
    // the CH4 half of the pin above — and nothing else.
    "q_edgar_dsv2_pushdown" ->
      """SELECT * FROM (VALUES
      ('ENE', 'CH4', '3.221384972505391e+19'::DOUBLE, 6::BIGINT),
      ('TRO', 'CH4', '3.221384972505391e+19'::DOUBLE, 6::BIGINT)
      ) AS t(category, substance, total, n_cells)""",
    "q_edgar_profiles" ->
      """SELECT * FROM (VALUES
      ('howm', 'CHE', 'TRO', 336::BIGINT, '1.0'::DOUBLE, '0.006206897'::DOUBLE),
      ('howm', 'EGY', 'TRO', 336::BIGINT, '1.0'::DOUBLE, '0.006206897'::DOUBLE),
      ('weekly', 'CHE', 'TRO', 7::BIGINT, '98.0'::DOUBLE, '17.0'::DOUBLE),
      ('weekly', 'EGY', 'TRO', 7::BIGINT, '168.0'::DOUBLE, '27.0'::DOUBLE)
      ) AS t(kind, country, category, n_pos, ratio_sum, ratio_max)""",
    "q_saunois" ->
      """SELECT * FROM (VALUES
      ('rice', 0::BIGINT, '2651392697.116885'::DOUBLE, 9::BIGINT),
      ('rice', 1::BIGINT, '5570878608.197494'::DOUBLE, 9::BIGINT),
      ('rice', 2::BIGINT, '3634630172.626362'::DOUBLE, 9::BIGINT),
      ('rice', 3::BIGINT, '6672310489.883599'::DOUBLE, 9::BIGINT),
      ('rice', 4::BIGINT, '4593515017.163467'::DOUBLE, 9::BIGINT),
      ('rice', 5::BIGINT, '6638933766.196142'::DOUBLE, 9::BIGINT),
      ('wetland', 0::BIGINT, '2499188753.5395675'::DOUBLE, 9::BIGINT),
      ('wetland', 1::BIGINT, '5285659333.050127'::DOUBLE, 9::BIGINT),
      ('wetland', 2::BIGINT, '3066909463.0829644'::DOUBLE, 9::BIGINT),
      ('wetland', 3::BIGINT, '5989604778.09469'::DOUBLE, 9::BIGINT),
      ('wetland', 4::BIGINT, '3634630172.626362'::DOUBLE, 9::BIGINT),
      ('wetland', 5::BIGINT, '6672310489.883599'::DOUBLE, 9::BIGINT)
      ) AS t(category, cell_id, value, n_months)""",
    "q_wetcharts" ->
      """SELECT * FROM (VALUES
      ('m2913', 1::BIGINT, '1871058.826481162'::DOUBLE, '0.07017543859649122'::DOUBLE),
      ('m2913', 2::BIGINT, '1887748.6007259723'::DOUBLE, '0.07017543859649122'::DOUBLE),
      ('m2913', 3::BIGINT, '2658873.0692100725'::DOUBLE, '0.07407407407407407'::DOUBLE),
      ('m2913', 4::BIGINT, '2682590.1168211186'::DOUBLE, '0.07407407407407407'::DOUBLE),
      ('m2913', 5::BIGINT, '3446687.3119389834'::DOUBLE, '0.0761904761904762'::DOUBLE),
      ('mean', 1::BIGINT, '1903884.4199281998'::DOUBLE, '0.06896551724137931'::DOUBLE),
      ('mean', 2::BIGINT, '1920866.9972299365'::DOUBLE, '0.06896551724137931'::DOUBLE),
      ('mean', 3::BIGINT, '2691698.6626571105'::DOUBLE, '0.07317073170731707'::DOUBLE),
      ('mean', 4::BIGINT, '2715708.513325083'::DOUBLE, '0.07317073170731707'::DOUBLE),
      ('mean', 5::BIGINT, '3479512.905386021'::DOUBLE, '0.07547169811320754'::DOUBLE)
      ) AS t(mode, cell_id, value, ratio0)""",
    "q_gfas" ->
      """SELECT * FROM (VALUES
      ('annual', 'CO2', '5.663298185715117e+16'::DOUBLE, 2::BIGINT),
      ('daily', 'CO2', '13.5'::DOUBLE, 3::BIGINT)
      ) AS t(kind, substance, total, n_rows)""",
    "q_gfed4" ->
      """SELECT * FROM (VALUES
      ('SAVA', 'DM', '170.0'::DOUBLE, 4::BIGINT),
      ('TEMF', 'DM', '210.0'::DOUBLE, 3::BIGINT)
      ) AS t(category, substance, total, n_cells)""",
    // q_gfed4_nf: same data, new-format container — the pin MUST equal
    // q_gfed4's (that identity is the point of the gate)
    "q_gfed4_nf" ->
      """SELECT * FROM (VALUES
      ('SAVA', 'DM', '170.0'::DOUBLE, 4::BIGINT),
      ('TEMF', 'DM', '210.0'::DOUBLE, 3::BIGINT)
      ) AS t(category, substance, total, n_cells)""",
    "q_image_decode" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 32::BIGINT, 24::BIGINT, -6154919347574127275::BIGINT, -5344265964282882726::BIGINT, '99.489797'::DOUBLE),
      (1::BIGINT, 32::BIGINT, 24::BIGINT, -6154919485013080747::BIGINT, -5344265964282882726::BIGINT, '100.990312'::DOUBLE),
      (2::BIGINT, 32::BIGINT, 24::BIGINT, -6148727039149299115::BIGINT, -5929739487521426090::BIGINT, '103.766906'::DOUBLE),
      (3::BIGINT, 32::BIGINT, 24::BIGINT, -6148727039149299115::BIGINT, -5929739487521426090::BIGINT, '105.61575'::DOUBLE),
      (4::BIGINT, 32::BIGINT, 24::BIGINT, 6148973332102731562::BIGINT, 6222474632622402221::BIGINT, '123.628219'::DOUBLE),
      (5::BIGINT, 32::BIGINT, 24::BIGINT, -6154919347574127275::BIGINT, -5344265964282882726::BIGINT, '99.489797'::DOUBLE)
      ) AS t(doc_id, width, height, a_hash, d_hash, mean_lum)""",
    "q_image_neardup" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 1::BIGINT, 0::BIGINT),
      (0::BIGINT, 5::BIGINT, 0::BIGINT),
      (1::BIGINT, 5::BIGINT, 0::BIGINT),
      (2::BIGINT, 3::BIGINT, 0::BIGINT)
      ) AS t(doc_a, doc_b, hamming)""",
    "q_lpj" ->
      """SELECT * FROM (VALUES
      ('annual', 'peatland', 'CH4', '120935.078313'::DOUBLE, 1::BIGINT),
      ('annual', 'wetland_nat', 'CH4', '194813.62959'::DOUBLE, 1::BIGINT),
      ('ratio', 'peatland', 'CH4', '1.0'::DOUBLE, 1::BIGINT),
      ('ratio', 'wetland_nat', 'CH4', '1.0'::DOUBLE, 2::BIGINT)
      ) AS t(kind, category, substance, total, n_rows)""",
    "q_mapluft" ->
      """SELECT * FROM (VALUES
      ('c1301_Strassenverkehr_Linien', 'CO2', '246.0'::DOUBLE, 4::BIGINT),
      ('c1301_Strassenverkehr_Linien', 'NOx', NULL, 0::BIGINT),
      ('c2201_BHKW_Punkt', 'CO2', '750.0'::DOUBLE, 6::BIGINT),
      ('c2201_BHKW_Punkt', 'NOx', '45.0'::DOUBLE, 6::BIGINT)
      ) AS t(category, substance, total, n_sources)""",
    "q_osm" ->
      """SELECT * FROM (VALUES
      (1::BIGINT, 'node', 'Brunnen', 0::BIGINT, NULL, 'point', 1::BIGINT, '8.5401'::DOUBLE, '47.3782'::DOUBLE),
      (100::BIGINT, 'way', 'Teststrasse', 0::BIGINT, NULL, 'line', 3::BIGINT, '8.5'::DOUBLE, '47.35'::DOUBLE),
      (101::BIGINT, 'way', NULL, 0::BIGINT, NULL, 'polygon', 4::BIGINT, '8.53'::DOUBLE, '47.37'::DOUBLE),
      (200::BIGINT, 'relation', 'Stadtpark', 0::BIGINT, 'outer', 'polygon', 5::BIGINT, '8.55'::DOUBLE, '47.38'::DOUBLE),
      (200::BIGINT, 'relation', 'Stadtpark', 1::BIGINT, 'inner', 'polygon', 4::BIGINT, '8.553'::DOUBLE, '47.383'::DOUBLE),
      (200::BIGINT, 'relation', 'Stadtpark', 2::BIGINT, NULL, 'point', 1::BIGINT, '8.5401'::DOUBLE, '47.3782'::DOUBLE)
      ) AS t(id, el_type, name, part, role, kind, n_vertices, x0, y0)""",
    "q_tno" ->
      """SELECT * FROM (VALUES
      ('area', 'A', 'CH4', '0.5'::DOUBLE, 1::BIGINT),
      ('area', 'A', 'CO2', '44.0'::DOUBLE, 2::BIGINT),
      ('area', 'B', 'CO2', '22.0'::DOUBLE, 1::BIGINT),
      ('point', 'A', 'CH4', '0.25'::DOUBLE, 1::BIGINT),
      ('point', 'A', 'CO2', '44.0'::DOUBLE, 1::BIGINT),
      ('point', 'B', 'CO2', '55.0'::DOUBLE, 1::BIGINT)
      ) AS t(kind, category, substance, total, n_rows)""",
    "q_video_decode" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 32::BIGINT, 24::BIGINT, 12::BIGINT, '10.0'::DOUBLE, '1.2'::DOUBLE, 'MJPG'),
      (1::BIGINT, 32::BIGINT, 24::BIGINT, 6::BIGINT, '5.0'::DOUBLE, '1.2'::DOUBLE, 'MJPG'),
      (2::BIGINT, 32::BIGINT, 24::BIGINT, 8::BIGINT, '10.0'::DOUBLE, '0.8'::DOUBLE, 'MJPG')
      ) AS t(doc_id, width, height, n_frames, fps, duration_s, handler)""",
    "q_video_neardup" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 2::BIGINT, 1::BIGINT, 2::BIGINT, 1::BIGINT, '1.0'::DOUBLE)
      ) AS t(doc_a, doc_b, shared, n_a, n_b, overlap)""",
    "q_video_frames" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 0::BIGINT, -5344265964282882726::BIGINT, '101.723531'::DOUBLE, NULL::BIGINT, false),
      (0::BIGINT, 2::BIGINT, -5344265964282882726::BIGINT, '101.143453'::DOUBLE, 0::BIGINT, false),
      (0::BIGINT, 4::BIGINT, -5344265964282882726::BIGINT, '103.351109'::DOUBLE, 0::BIGINT, false),
      (0::BIGINT, 6::BIGINT, -5344265964282882726::BIGINT, '100.962984'::DOUBLE, 0::BIGINT, false),
      (0::BIGINT, 8::BIGINT, 7759057115518053845::BIGINT, '146.856906'::DOUBLE, 45::BIGINT, true),
      (0::BIGINT, 10::BIGINT, 7759057115518053845::BIGINT, '147.298187'::DOUBLE, 0::BIGINT, false),
      (1::BIGINT, 0::BIGINT, 6222474632622398123::BIGINT, '116.205297'::DOUBLE, NULL::BIGINT, false),
      (1::BIGINT, 2::BIGINT, 6222474632622398123::BIGINT, '115.547984'::DOUBLE, 0::BIGINT, false),
      (1::BIGINT, 4::BIGINT, 6222474632622398123::BIGINT, '115.953359'::DOUBLE, 0::BIGINT, false),
      (2::BIGINT, 0::BIGINT, -5344265964282882726::BIGINT, '101.723531'::DOUBLE, NULL::BIGINT, false),
      (2::BIGINT, 2::BIGINT, -5344265964282882726::BIGINT, '101.143453'::DOUBLE, 0::BIGINT, false),
      (2::BIGINT, 4::BIGINT, -5344265964282882726::BIGINT, '103.351109'::DOUBLE, 0::BIGINT, false),
      (2::BIGINT, 6::BIGINT, -5344265964282882726::BIGINT, '100.962984'::DOUBLE, 0::BIGINT, false)
      ) AS t(doc_id, frame_idx, d_hash, mean_lum, hamming, is_cut)""",
    "q_wav_decode" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 8000::BIGINT, 1::BIGINT, 16::BIGINT, 4000::BIGINT, '0.5'::DOUBLE, '0.353526'::DOUBLE)
      ) AS t(doc_id, sample_rate, channels, bits, n_samples, duration_s, rms)""",
    "q_audio_fingerprint" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 61::BIGINT, 1::BIGINT, 123141920::BIGINT),
      (1::BIGINT, 64::BIGINT, 1::BIGINT, 135449600::BIGINT),
      (2::BIGINT, 61::BIGINT, 2::BIGINT, 121097856::BIGINT)
      ) AS t(doc_id, n_frames, n_distinct, fp_checksum)""",
    "q_audio_neardup" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 1::BIGINT, 1::BIGINT, 1::BIGINT, 1::BIGINT, '1.0'::DOUBLE)
      ) AS t(doc_a, doc_b, shared, n_a, n_b, overlap)""",
    "q_image_scrub" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, 'png', 1::BIGINT, 'tEXt', 2416::BIGINT, 2377::BIGINT, 1::INT),
      (1::BIGINT, 'png', 2::BIGINT, 'tEXt,tEXt', 2437::BIGINT, 2377::BIGINT, 1::INT),
      (2::BIGINT, 'png', 1::BIGINT, 'tEXt', 2413::BIGINT, 2374::BIGINT, 1::INT),
      (3::BIGINT, 'png', 2::BIGINT, 'tEXt,tEXt', 2434::BIGINT, 2374::BIGINT, 1::INT),
      (4::BIGINT, 'png', 1::BIGINT, 'tEXt', 2417::BIGINT, 2378::BIGINT, 1::INT),
      (5::BIGINT, 'png', 2::BIGINT, 'tEXt,tEXt', 2437::BIGINT, 2377::BIGINT, 1::INT),
      (100::BIGINT, 'jpeg', 1::BIGINT, 'APP1', 1131::BIGINT, 1057::BIGINT, 1::INT)
      ) AS t(doc_id, format, n_removed, removed, bytes_before, bytes_after, pixels_same)""",
    "q_wrf_grid" ->
      """SELECT * FROM (VALUES
      (0::BIGINT, '9.89'::DOUBLE, '44.9'::DOUBLE, '10.11'::DOUBLE, '45.1'::DOUBLE, '350.502717'::DOUBLE),
      (1::BIGINT, '9.91'::DOUBLE, '45.1'::DOUBLE, '10.13'::DOUBLE, '45.3'::DOUBLE, '349.277099'::DOUBLE),
      (2::BIGINT, '10.09'::DOUBLE, '44.9'::DOUBLE, '10.31'::DOUBLE, '45.1'::DOUBLE, '350.502717'::DOUBLE),
      (3::BIGINT, '10.11'::DOUBLE, '45.1'::DOUBLE, '10.33'::DOUBLE, '45.3'::DOUBLE, '349.277099'::DOUBLE),
      (4::BIGINT, '10.29'::DOUBLE, '44.9'::DOUBLE, '10.51'::DOUBLE, '45.1'::DOUBLE, '350.502717'::DOUBLE),
      (5::BIGINT, '10.31'::DOUBLE, '45.1'::DOUBLE, '10.53'::DOUBLE, '45.3'::DOUBLE, '349.277099'::DOUBLE)
      ) AS t(cell_id, bl_lon, bl_lat, tr_lon, tr_lat, area_km2)""",
    "q_warc_read" ->
      """SELECT * FROM (VALUES
      ('shard_000.warc', 0::BIGINT, 'warcinfo', '', '2026-01-02T03:04:05Z', -1::BIGINT, '', 29::BIGINT, 29::BIGINT),
      ('shard_000.warc', 1::BIGINT, 'request', 'http://example.test/', '2026-01-02T03:04:06Z', -1::BIGINT, '', 38::BIGINT, 38::BIGINT),
      ('shard_000.warc', 2::BIGINT, 'response', 'http://example.test/', '2026-01-02T03:04:06Z', 200::BIGINT, 'text/html; charset=UTF-8', 563::BIGINT, 483::BIGINT),
      ('shard_000.warc', 3::BIGINT, 'response', 'http://example.test/two', '2026-01-02T03:04:07Z', 200::BIGINT, 'text/html', 274::BIGINT, 209::BIGINT),
      ('shard_000.warc', 4::BIGINT, 'response', 'http://example.test/miss', '2026-01-02T03:04:08Z', 404::BIGINT, 'text/plain', 76::BIGINT, 5::BIGINT),
      ('shard_001.warc.gz', 0::BIGINT, 'warcinfo', '', '2026-01-02T03:04:05Z', -1::BIGINT, '', 29::BIGINT, 29::BIGINT),
      ('shard_001.warc.gz', 1::BIGINT, 'request', 'http://example.test/', '2026-01-02T03:04:06Z', -1::BIGINT, '', 38::BIGINT, 38::BIGINT),
      ('shard_001.warc.gz', 2::BIGINT, 'response', 'http://example.test/', '2026-01-02T03:04:06Z', 200::BIGINT, 'text/html; charset=UTF-8', 563::BIGINT, 483::BIGINT),
      ('shard_001.warc.gz', 3::BIGINT, 'response', 'http://example.test/two', '2026-01-02T03:04:07Z', 200::BIGINT, 'text/html', 274::BIGINT, 209::BIGINT),
      ('shard_001.warc.gz', 4::BIGINT, 'response', 'http://example.test/miss', '2026-01-02T03:04:08Z', 404::BIGINT, 'text/plain', 76::BIGINT, 5::BIGINT)
      ) AS t(file, seq, warc_type, target_uri, warc_date, http_status, http_content_type, content_length, body_bytes)""",
    "q_stream_warc" ->
      """SELECT * FROM (VALUES
      ('shard_000.warc', 0::BIGINT, 'warcinfo', '', '2026-01-02T03:04:05Z', -1::BIGINT, '', 29::BIGINT, 29::BIGINT),
      ('shard_000.warc', 1::BIGINT, 'request', 'http://example.test/', '2026-01-02T03:04:06Z', -1::BIGINT, '', 38::BIGINT, 38::BIGINT),
      ('shard_000.warc', 2::BIGINT, 'response', 'http://example.test/', '2026-01-02T03:04:06Z', 200::BIGINT, 'text/html; charset=UTF-8', 563::BIGINT, 483::BIGINT),
      ('shard_000.warc', 3::BIGINT, 'response', 'http://example.test/two', '2026-01-02T03:04:07Z', 200::BIGINT, 'text/html', 274::BIGINT, 209::BIGINT),
      ('shard_000.warc', 4::BIGINT, 'response', 'http://example.test/miss', '2026-01-02T03:04:08Z', 404::BIGINT, 'text/plain', 76::BIGINT, 5::BIGINT),
      ('shard_001.warc.gz', 0::BIGINT, 'warcinfo', '', '2026-01-02T03:04:05Z', -1::BIGINT, '', 29::BIGINT, 29::BIGINT),
      ('shard_001.warc.gz', 1::BIGINT, 'request', 'http://example.test/', '2026-01-02T03:04:06Z', -1::BIGINT, '', 38::BIGINT, 38::BIGINT),
      ('shard_001.warc.gz', 2::BIGINT, 'response', 'http://example.test/', '2026-01-02T03:04:06Z', 200::BIGINT, 'text/html; charset=UTF-8', 563::BIGINT, 483::BIGINT),
      ('shard_001.warc.gz', 3::BIGINT, 'response', 'http://example.test/two', '2026-01-02T03:04:07Z', 200::BIGINT, 'text/html', 274::BIGINT, 209::BIGINT),
      ('shard_001.warc.gz', 4::BIGINT, 'response', 'http://example.test/miss', '2026-01-02T03:04:08Z', 404::BIGINT, 'text/plain', 76::BIGINT, 5::BIGINT)
      ) AS t(file, seq, warc_type, target_uri, warc_date, http_status, http_content_type, content_length, body_bytes)""",
    "q_crawl_extract" ->
      """SELECT * FROM (VALUES
      ('shard_000.warc', 2::BIGINT, 'http://example.test/', 6::BIGINT, 4::BIGINT, 145::BIGINT, 20::BIGINT, 27::BIGINT, 781751::BIGINT),
      ('shard_000.warc', 3::BIGINT, 'http://example.test/two', 4::BIGINT, 3::BIGINT, 56::BIGINT, 2::BIGINT, 10::BIGINT, 184471179::BIGINT),
      ('shard_001.warc.gz', 2::BIGINT, 'http://example.test/', 6::BIGINT, 4::BIGINT, 145::BIGINT, 20::BIGINT, 27::BIGINT, 781751::BIGINT),
      ('shard_001.warc.gz', 3::BIGINT, 'http://example.test/two', 4::BIGINT, 3::BIGINT, 56::BIGINT, 2::BIGINT, 10::BIGINT, 184471179::BIGINT)
      ) AS t(file, seq, url, n_blocks, n_kept, n_chars, n_link_chars, n_words, text_hash)"""
  )
}
