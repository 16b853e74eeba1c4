-- End-to-end training-data assembly, entirely in the DSL.
-- Composes the datapipe operators the way a real corpus build does:
--   quality gates -> PII scrub -> exact dedup -> per-source caps ->
--   mixture sampling -> sequence packing.
-- Run: python -m piglet_spark examples/training_pipeline.pig \
--        -p sf=/root/testdata/sf0.001

D = LOAD '$sf/documents.parquet' USING ParquetStorage();

-- 1. per-document stats; gate on quality and length
ST = STREAM D THROUGH doc_stats();
QOK = FILTER ST BY quality >= 0.62 AND n_tokens >= 5;

-- 2. Gopher repetition rules (Rae et al. 2021 Table A1)
RK = STREAM D THROUGH gopher_repetition_ok();
ROK = FILTER RK BY keep == true;

J1 = JOIN D BY doc_id, QOK BY doc_id;
J2 = JOIN J1 BY D::doc_id, ROK BY doc_id;
P = FOREACH J2 GENERATE D::doc_id AS doc_id, D::text AS text,
    D::source AS source;

-- 3. PII hygiene (C4/RefinedWeb-style typed redaction)
C = STREAM P THROUGH pii_scrub();

-- 4. exact dedup: keep the lowest-id doc per normalized fingerprint
K = STREAM C THROUGH exact_dedup();
J3 = JOIN C BY doc_id, K BY keep_id;
U = FOREACH J3 GENERATE C::doc_id AS doc_id, C::text AS text,
    C::source AS source;

-- 5. rank-based quality gate: keep the top 80% by length (stand-in
--    for any model-based score column) — calibration-free
G0 = FOREACH U GENERATE doc_id, text, source, STRLEN(text) AS len;
G1 = STREAM G0 THROUGH take_top_frac('len', 0.8);
G = FOREACH G1 GENERATE doc_id, text, source;

-- 6. web-corpus hygiene: at most 40 docs per source, then mix
CAP = STREAM G THROUGH cap_per_group(40, 'source');
MIX = STREAM CAP THROUGH mixture_sample('src0:1.0,src1:0.5', 42, 0.8);

-- 7. deterministic train/val/test assignment (same row -> same
--    split on every run; no rand() reshuffling between evals)
SPL = STREAM MIX THROUGH split_assign('train:0.96,val:0.02,test:0.02', 42);
TRAIN = FILTER SPL BY split == 'train';

-- 8. reproducible global shuffle (read order for the training run —
--    same seed, same permutation at any cluster size)
SH = STREAM TRAIN THROUGH global_shuffle(42);

-- 9. pack the survivors into fixed 256-token training sequences
PACKED = STREAM SH THROUGH chunk_pack(256);

STORE PACKED INTO '$out' USING ParquetStorage();
