"""LLM-training-data pipeline operators (north-star extensions, SURVEY §2.11).

No counterpart in the reference connector; these are the operators a
100-TB-scale training-data pipeline needs, built Spark-first:

- ``text``        tokenization, quality scoring, language-ID heuristic,
                  Gopher-style repetition filters, normalization, PII
                  scrubbing, document fingerprinting — whole-stage-codegen'd
                  expressions (NFC alone rides an Arrow pandas_udf)
- ``dedup``       exact, n-gram Jaccard (inverted shingle index),
                  MinHash+LSH, SimHash — shuffle-aware formulations
- ``graph``       near-dup pairs → canonical-doc clusters (checkpointed
                  min-label-propagation connected components)
- ``similarity``  brute-force cosine top-k (exact baseline) and
                  random-hyperplane LSH bucketing (the scale path)
- ``multimodal``  opaque binary columns + Arrow-batched feature extraction
                  (decode stubbed: no codec libs in this environment)
- ``pipeline``    composed corpus stages: clean chain, stratified sampling,
                  decontamination, sequence packing, corpus stats
- ``contrastive`` deterministic hash-draw negative sampling for
                  contrastive pairs (engine-portable md5 draws)
- ``pca``         distributed PCA/whitening: mergeable second-moment
                  sketch + driver eig + Arrow-batched projection
"""

from . import (  # noqa: F401
    contrastive,
    dedup,
    graph,
    multimodal,
    pca,
    pipeline,
    similarity,
    text,
)
