"""Training-data pipeline operators (beyond-parity surface).

The reference is a pure query engine; these modules add the operations
a large-scale LLM-training-data pipeline needs, built DataFrame-native
so they inherit the same scale story (shuffle-partitioned, AQE,
Parquet pushdown):

  dedup       exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
  similarity  brute-force + LSH-bucketed + IVF cosine ANN over embeddings
  text        language-ID, quality scoring, token counts, fingerprints,
              repetition (Gopher-style) signals
  packing     concat-then-chunk sequence packing
  sampling    deterministic sampling / train-test split / stratified cap
  decontam    eval-set n-gram contamination check + filter
  redact      PII detection and redaction (regex, NER-pluggable)
  multimodal  binary media columns: schema, batching, stubbed decodes
"""
