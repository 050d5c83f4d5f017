"""LLM-training-data pipeline operators (north-star extensions, SURVEY §2.11).

No counterpart in the reference connector; these are the operators a
100-TB-scale training-data pipeline needs, built Spark-first:

- ``text``        tokenization, quality scoring, language-ID heuristic,
                  document fingerprinting — all whole-stage-codegen'd
                  expressions, no UDFs
- ``dedup``       exact, n-gram Jaccard (inverted shingle index),
                  MinHash+LSH, SimHash — shuffle-aware formulations
- ``similarity``  brute-force cosine top-k (exact baseline) and
                  random-hyperplane LSH bucketing (the scale path)
- ``multimodal``  opaque binary columns + Arrow-batched feature extraction
                  (decode stubbed: no codec libs in this environment)
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
