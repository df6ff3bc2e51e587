"""Round-7+ BPE tokenizer: distributed counting + driver induction +
distributed encoding, pinned against an INDEPENDENT naive reference.

The reference trainer here works on the RAW expanded corpus (a python
list of words, one entry per occurrence) with an O(corpus) recount per
merge — no word-frequency table, no shared code with the operator — so
the operator's frequency-weighted induction must agree with brute
force.  Encoding is pinned by the classic Sennrich example, a
reconstruction invariant (tokens concatenate back to the word), and an
end-to-end Spark run recomputed driver-side.
"""

from __future__ import annotations

import numpy as np

from rust_near_indexer_spark.operators.bpe import (
    END,
    bpe_encode_docs,
    bpe_encode_word,
    bpe_token_counts,
    learn_bpe,
    learn_bpe_merges,
)


def _naive_learn(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Brute-force BPE: corpus as a list of symbol lists (one per word
    OCCURRENCE), full recount each round, ties lexicographic."""
    corpus = [list(w) + [END] for w in words]
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms in corpus:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + 1
                )
        if not counts:
            break
        pair, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append(pair)
        for syms in corpus:
            i = 0
            while i < len(syms) - 1:
                if (syms[i], syms[i + 1]) == pair:
                    syms[i : i + 2] = [syms[i] + syms[i + 1]]
                else:
                    i += 1
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trainer_matches_bruteforce_sennrich():
    words = [w for w, n in SENNRICH.items() for _ in range(n)]
    got = learn_bpe_merges(list(SENNRICH.items()), 8)
    want = _naive_learn(words, 8)
    assert got == want
    # the canonical first merges of the Sennrich example corpus
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")
    assert got[2] == ("est", END)


def test_trainer_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    alphabet = "abcdef"
    words = [
        "".join(rng.choice(list(alphabet), size=rng.integers(1, 7)))
        for _ in range(200)
    ]
    freqs: dict = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    assert learn_bpe_merges(list(freqs.items()), 12) == _naive_learn(words, 12)


def test_trainer_input_order_invariant():
    items = list(SENNRICH.items())
    assert learn_bpe_merges(items, 6) == learn_bpe_merges(items[::-1], 6)


def test_encode_reconstruction_and_greedy_rank():
    merges = learn_bpe_merges(list(SENNRICH.items()), 10)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in list(SENNRICH) + ["lowest", "newer", "wide", "unseen", "x"]:
        toks = bpe_encode_word(w, ranks, {})
        assert "".join(toks) == w + END  # lossless
    # a trained word encodes to few symbols; an alien word stays chars
    assert len(bpe_encode_word("newest", ranks, {})) <= 2
    assert len(bpe_encode_word("zzqq", ranks, {})) == 5  # 4 chars + END


def test_spark_end_to_end(spark):
    """learn_bpe over a Spark corpus == driver induction over the same
    frequencies; token counts from the operator == driver re-encode."""
    docs = [
        (1, "low low low low low lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = learn_bpe(df, n_merges=8)
    assert merges == learn_bpe_merges(list(SENNRICH.items()), 8)

    counts = {r["doc_id"]: r for r in bpe_token_counts(df, merges).collect()}
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for did, text in docs:
        if text is None:
            assert did not in counts
            continue
        want = sum(len(bpe_encode_word(w, ranks, {})) for w in text.split())
        assert counts[did]["n_tokens"] == want

    toks = bpe_encode_docs(df.where("doc_id = 2"), merges).collect()
    seq = [r["token"] for r in sorted(toks, key=lambda r: r["pos"])]
    assert seq == ["newest" + END] * 6 or seq == [
        t for _ in range(6) for t in bpe_encode_word("newest", ranks, {})
    ]


def test_token_counts_plan_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        bpe_token_counts(df, [("a", END)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan and "Exchange" not in plan


def test_fixed_merge_oracle_identity():
    """The gate oracle for bpe_fixed_merge_token_counts rests on:
    greedy BPE over char-disjoint pairs == non-overlapping substring
    counting.  Pin that identity against the real encoder on an
    adversarial word space built FROM the merge alphabet."""
    from itertools import product

    from rust_near_indexer_spark.operators.bpe import bpe_encode_word
    from rust_near_indexer_spark.queries.text import BPE_FIXED_MERGES

    ranks = {p: i for i, p in enumerate(BPE_FIXED_MERGES)}
    alphabet = "esthan"
    for n in (1, 2, 3, 4):
        for chars in product(alphabet, repeat=n):
            w = "".join(chars)
            occ = sum(
                (len(w) - len(w.replace(a + b, ""))) // 2
                for a, b in BPE_FIXED_MERGES
            )
            toks = bpe_encode_word(w, ranks, {})
            assert len(toks) == len(w) + 1 - occ, w
            assert sum(1 for t in toks if len(t) == 1) == len(w) - 2 * occ, w
