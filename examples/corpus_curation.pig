-- Corpus curation & monitoring: the hygiene/reporting side of a
-- training-data build — benchmark decontamination via a Bloom
-- bitmap, boilerplate line stripping, first-seen near-dup audit,
-- per-source corpus cards, and user sessionization of the event log.
-- Run: python -m piglet_spark examples/corpus_curation.pig \
--        -p sf=/root/testdata/sf0.001 -p out=/tmp/curation

D = LOAD '$sf/documents.parquet' USING ParquetStorage();
EV = LOAD '$sf/events.parquet' USING ParquetStorage();

-- 1. Bloom-bitmap decontamination: src0 plays the benchmark suite;
--    the corpus probe is map-only against a broadcast bitmap
BD = STREAM D THROUGH bloom_decon('src0', 5);
CLEAN = FILTER BD BY bloom_contamination <= 0.5;
J = JOIN D BY doc_id, CLEAN BY doc_id;
P = FOREACH J GENERATE D::doc_id AS doc_id, D::text AS text,
    D::lang AS lang, D::source AS source;

-- 2. strip cross-document boilerplate lines (Gopher hygiene),
--    order-preserving rebuild
S = STREAM P THROUGH strip_dup_lines();

-- 3. first-seen near-dup audit: which surviving docs are LSH-close
--    to an earlier-accepted one? (streaming ingest runs the same op
--    with applyInPandasWithState state)
ND = STREAM P THROUGH neardup_ingest(0.5);

-- 4. per-source corpus card for the datasheet
RPT = STREAM P THROUGH corpus_report('source');

-- 5. user sessions from the event log (>30 min gap splits)
SESS = STREAM EV THROUGH session_stats(1800);

STORE RPT INTO '$out/report' USING ParquetStorage();
STORE SESS INTO '$out/sessions' USING ParquetStorage();
