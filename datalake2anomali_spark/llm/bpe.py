"""Trained byte-pair encoding: corpus-exact merge table + distributed
encoder — the real tokenizer behind every LLM data pipeline's "token
count", where :func:`..text.tokens_col` is only the whitespace baseline.

Scale split, the same shape as the ANN trainers (``similarity.py``):

- **Training is vocabulary-sized, so it centralizes.**  BPE learns from
  the WORD-FREQUENCY table, not the corpus: one distributed
  explode+groupBy collects ``(word, count)`` — bounded by the distinct
  vocabulary (capped at ``max_words`` by frequency, deterministic
  lexicographic ties) — and the merge loop (Sennrich et al., "Neural
  Machine Translation of Rare Words with Subword Units", ACL'16) runs in
  pure Python over that dict.  Ties between equal-frequency pairs break
  lexicographically, so the merge table is a pure function of the corpus
  — identical across partitionings, retries, and engines.
- **Encoding is map-only, so it distributes.**  The merge-rank dict
  rides an Arrow-batched pandas UDF; per batch each DISTINCT word is
  encoded once and cached (natural-language batches repeat words
  heavily), then results fan back out to rows.

End-of-word is modeled with the ``</w>`` sentinel on the last symbol, so
merges never cross word boundaries and detokenization is exact
(concatenate, strip sentinel) — pinned by the roundtrip test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel fused onto a word's final symbol.
EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_words: int = 50_000
) -> list[tuple[str, int]]:
    """(word, count) pairs, most frequent first (lexicographic ties) —
    the distributed half of training; driver state is min(vocab,
    max_words) rows."""
    rows = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], int(r["n"])) for r in rows]


def _word_symbols(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def bpe_train_merges(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The ordered merge table: repeatedly fuse the most frequent
    adjacent symbol pair across the (frequency-weighted) vocabulary.
    Pure python over the vocab dict; deterministic tie-breaks."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in word_freqs:
        vocab[_word_symbols(w)] = vocab.get(_word_symbols(w), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # deterministic selection: max count, then shortest merged
        # symbol, then lexicographically smallest pair
        best_count = max(pairs.values())
        best_pair = min(
            (p for p, n in pairs.items() if n == best_count),
            key=lambda p: (len(p[0] + p[1]), p),
        )
        merges.append(best_pair)
        a, b = best_pair
        fused = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Distributed word counting + python merge loop — see module doc."""
    return bpe_train_merges(word_frequencies(docs, text_col, max_words), n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (the GPT-2 encoder loop)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokens_col(
    text: Column, merges: list[tuple[str, str]]
) -> Column:
    """array<string> BPE tokens per document — Arrow-batched, with a
    per-batch distinct-word cache (the encoder's cost is per unique
    word, not per occurrence)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = encode_word(w, ranks)
                toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return enc(text)


def decode_tokens(tokens: list[str]) -> str:
    """Exact inverse of the encoder: concatenate, split on the sentinel."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")
