"""Byte-pair encoding tokenizer (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") —
train a merge table on the corpus, encode documents with it, and count
real subword tokens (the budget currency a training pipeline actually
bills in; the regex `bpe_ish_tokens` is the vocab-free approximation).

Scale shapes:
  * TRAINING is two phases: ONE distributed aggregation collapses the
    corpus to its word-frequency table (vocabulary-sized — model
    state, like the IVF centroids), then the classic merge loop runs
    driver-side over that table.  The corpus is read once regardless
    of vocab size; no per-merge Spark job (a naive distributed BPE
    pays one shuffle per merge — 32k merges = 32k jobs).
  * ENCODING is Arrow-batched ``mapInPandas`` with a per-batch
    word→pieces memo — Zipf makes the memo hit rate very high, so the
    per-row cost approaches a dict lookup.  A pure-Catalyst encode is
    not expressible (data-dependent iterated rewriting), which is
    exactly the case the UDF escape hatch exists for.

Determinism: the word table is capped by (count DESC, word) order,
ties in pair frequency break lexicographically, so the same corpus
always trains the same merges — reruns and tests reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str, max_words: int) -> list[tuple[str, int]]:
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    wc = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["n"]) for r in wc]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Words are
    whitespace tokens, lower-cased, with the ``</w>`` end-of-word
    marker; the per-merge loop is the textbook algorithm over the
    word-frequency table (capped at ``max_words`` by count-desc,
    word-asc — deterministic).  Returns the ordered merge list."""
    words = _word_counts(df, text_col, max_words)
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in words:
        sym = tuple(list(w) + [_EOW])
        vocab[sym] = vocab.get(sym, 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing repeats: further merges are memorization
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def _make_word_encoder(ranks: dict[tuple[str, str], int]):
    """A SELF-CONTAINED word encoder closure: applies merges lowest
    rank first (standard BPE inference order ≡ replaying training
    order).  Built as a nested function so cloudpickle ships it BY
    VALUE into mapInPandas workers — a module-level function would be
    pickled by reference and require ``bigdata_old_spark`` on every
    executor's PYTHONPATH (true only when the driver happens to run
    from the repo root)."""

    def encode_word(word: str) -> list[str]:
        sym = list(word) + ["</w>"]
        while len(sym) > 1:
            best_i, best_rank = -1, None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_i, best_rank = i, r
            if best_rank is None:
                break
            sym[best_i: best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return sym

    return encode_word


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Driver-side convenience/test entry for one word."""
    return _make_word_encoder(ranks)(word)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode each document with a trained merge table.  Returns
    id_col | out_col (array<string>) | n_bpe_tokens.  Arrow-batched
    mapInPandas with a per-batch word memo (Zipf → high hit rate); the
    merge table rides in the closure (a few kB — plan-literal-sized
    model state)."""
    import re

    import pandas as pd  # noqa: F401 (mapInPandas contract)

    from pyspark.sql import types as T

    # ASCII \s+, exactly the tokenizer train_bpe's Spark-side F.split
    # (Java regex) and the SQL oracle use — Python's default \s (and
    # str.split) also split Unicode whitespace like NBSP, which would
    # make encoding disagree with training on word boundaries
    ws = re.compile(r"\s+", re.ASCII)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    encode_word = _make_word_encoder(ranks)
    schema = T.StructType([
        df.schema[id_col],
        T.StructField(out_col, T.ArrayType(T.StringType())),
        T.StructField("n_bpe_tokens", T.LongType()),
    ])
    src = df.select(id_col, text_col)

    def encode_batches(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out_tokens = []
            out_counts = []
            for text in pdf[text_col]:
                pieces: list[str] = []
                for w in filter(None, ws.split((text or "").lower())):
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = encode_word(w)
                    pieces.extend(enc)
                out_tokens.append(pieces)
                out_counts.append(len(pieces))
            yield pdf[[id_col]].assign(**{out_col: out_tokens, "n_bpe_tokens": out_counts})

    return src.mapInPandas(encode_batches, schema)
