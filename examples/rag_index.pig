-- Retrieval-index assembly: gate boilerplate documents, chunk the
-- survivors into retrieval windows, semantically dedupe the vector
-- side, and serve an ANN query — all in the DSL.
-- Run: python -m piglet_spark examples/rag_index.pig \
--        -p sf=/root/testdata/sf0.001 -p qvec='0.1,0.1,...'

D = LOAD '$sf/documents.parquet' USING ParquetStorage();
E = LOAD '$sf/embeddings.parquet' USING ParquetStorage();

-- 1. cross-document boilerplate gate (ExactSubstr-proxy): drop docs
--    whose 5-gram spans are mostly shared with other documents
SP = STREAM D THROUGH duplicate_spans(5);
CLEAN = FILTER SP BY dup_frac <= 0.5;
J = JOIN D BY doc_id, CLEAN BY doc_id;
P = FOREACH J GENERATE D::doc_id AS doc_id, D::text AS text;

-- 2. overlapping retrieval windows (64 tokens, stride 56)
CH = STREAM P THROUGH chunk_text(64, 8);

-- 3. vector side: SemDeDup keeps the most diverse member per
--    semantic group, then join back to retain the kept vectors
K = STREAM E THROUGH semantic_dedup(0.9);
KEEP = FILTER K BY keep == true;
JV = JOIN E BY vec_id, KEEP BY vec_id;
V = FOREACH JV GENERATE E::vec_id AS vec_id, E::embedding AS embedding;

-- 4. IVF ANN over the deduped index
HITS = STREAM V THROUGH ivf_topk('$qvec', 10);
