-- Retrieval quality & engagement signals: diversified dense
-- retrieval (MMR), int8 quantization audit, corpus OOV screen, and
-- event-log analytics (ordered funnel + last-write-wins compaction)
-- — the r08f operator family, composed purely in the DSL.
-- Run: python -m piglet_spark examples/retrieval_quality.pig \
--        -p sf=/root/testdata/sf0.001

D = LOAD '$sf/documents.parquet' USING ParquetStorage();
E = LOAD '$sf/embeddings.parquet' USING ParquetStorage();
EV = LOAD '$sf/events.parquet' USING ParquetStorage();

-- 1. diversified top-5 per query (every 100th vector), MMR λ=0.7
--    over a top-20 cosine pool
M = STREAM E THROUGH mmr(100, 5, 20, 0.7);

-- 2. int8 quantization audit: vectors whose dequantized cosine
--    stays ≥ 0.999 are safe to serve compressed
Q = STREAM E THROUGH quantize_embeddings();
SAFE = FILTER Q BY cos_q >= 0.999;

-- 3. OOV screen vs the corpus's own top-100 vocabulary: flag docs
--    that are mostly out-of-vocabulary (noise / wrong corpus)
VC = STREAM D THROUGH vocab_coverage(100);
NOISY = FILTER VC BY oov_rate > 0.5;

-- 4. event-log: strictly-ordered conversion funnel + the current
--    state per user (CDC compaction)
FU = STREAM EV THROUGH funnel('view,click,purchase');
CUR = STREAM EV THROUGH latest_by_key();
