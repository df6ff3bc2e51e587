"""Byte-pair-encoding tokenizer: distributed counting, local induction,
distributed encoding (north-star §LLM).

``bpe_pair_induction`` (queries/text.py) is one distributed round of
the trainer; this module completes the tokenizer the way a 100 TB
pipeline actually trains one:

1. **word_frequencies** — ONE map-combined groupBy over the corpus
   producing the (word, count) table.  This is the only pass that
   touches all the data; its output is bounded by vocabulary size, not
   corpus size (the classic wordcount shape).
2. **learn_bpe_merges** — Sennrich-style merge induction run
   DRIVER-SIDE over the top-``max_words`` rows of that table.  Vocab
   induction is inherently sequential (each merge changes the next
   pair count), so the scalable design is: distribute the counting,
   localize the tiny sequential loop — the same shape every production
   BPE trainer (GPT-2, SentencePiece) uses.
3. **bpe_token_counts / bpe_encode_docs** — distributed application of
   the learned merge ranks over ``mapInPandas``, greedy lowest-rank
   merge per word with a per-batch word cache (corpora are Zipfian:
   the cache hit-rate makes encoding ~O(distinct words), not
   O(tokens)).

Determinism: pair-count ties break lexicographically, the word table
is tie-broken by word, and encoding is a pure function of (word,
ranks) — byte-identical results on any cluster layout.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker symbol


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (word, n) via ONE map-combined aggregate.
    Whitespace pre-tokenization, empties dropped."""
    return (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _symbols(word: str) -> tuple:
    return tuple(word) + (END,)


def learn_bpe_merges(word_freqs, n_merges: int) -> list:
    """Sennrich BPE trainer over a (word, count) list: repeatedly merge
    the most frequent adjacent symbol pair (ties → lexicographically
    smallest pair).  Returns the ordered merge list [(a, b), ...]."""
    vocab = {_symbols(w): int(n) for w, n in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        pair, n_best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n_best < 2:  # nothing left worth merging
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def learn_bpe(docs: DataFrame, n_merges: int, max_words: int = 50_000) -> list:
    """Train merges: distributed word count, then driver-side induction
    over the ``max_words`` most frequent words (ties → word asc).  The
    collect is bounded by ``max_words`` rows, never corpus size."""
    top = (
        word_frequencies(docs)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    return learn_bpe_merges([(r["word"], r["n"]) for r in top], n_merges)


def bpe_encode_word(word: str, ranks: dict, cache: dict) -> list:
    """Greedy lowest-rank merge application (the GPT-2 encode loop):
    start from characters+END, repeatedly merge the adjacent pair with
    the smallest rank until no learnt pair remains."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    cache[word] = syms
    return syms


BPE_COUNTS_SCHEMA = "doc_id long, n_tokens long, n_unk_chars long"
BPE_TOKENS_SCHEMA = "doc_id long, pos long, token string"


def _ranks(merges) -> dict:
    return {tuple(p): i for i, p in enumerate(merges)}


def bpe_token_counts(docs: DataFrame, merges: list) -> DataFrame:
    """(doc_id, text) → (doc_id, n_tokens, n_unk_chars) under the
    learned merges — the EXACT token budget a packing/sharding stage
    needs (the whitespace token count is only a proxy).  Merge ranks
    ride the closure (tiny: n_merges entries) — broadcast semantics
    without a join; per-batch word cache exploits Zipf."""
    ranks = _ranks(merges)

    def _count(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            out = {"doc_id": [], "n_tokens": [], "n_unk_chars": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                n_tok = n_unk = 0
                for w in text.split():
                    toks = bpe_encode_word(w, ranks, cache)
                    n_tok += len(toks)
                    n_unk += sum(1 for t in toks if len(t) == 1)
                out["doc_id"].append(did)
                out["n_tokens"].append(n_tok)
                out["n_unk_chars"].append(n_unk)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        _count, schema=BPE_COUNTS_SCHEMA
    )


def bpe_encode_docs(docs: DataFrame, merges: list) -> DataFrame:
    """(doc_id, text) → one row per (doc_id, pos, token) — the encoded
    stream a training-shard writer consumes.  Same shape/caching as
    ``bpe_token_counts``; emits the fanned-out token rows, so run it
    AFTER length filtering, not before."""
    ranks = _ranks(merges)

    def _enc(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            out = {"doc_id": [], "pos": [], "token": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                pos = 0
                for w in text.split():
                    for t in bpe_encode_word(w, ranks, cache):
                        out["doc_id"].append(did)
                        out["pos"].append(pos)
                        out["token"].append(t)
                        pos += 1
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        _enc, schema=BPE_TOKENS_SCHEMA
    )
