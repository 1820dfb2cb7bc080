"""Distributed BPE trainer/encoder vs a pure-Python reference
implementation (the classic Sennrich word-level formulation)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from diseasystore_spark.pipeline.bpe import bpe_encode, bpe_train

EOW = "</w>"


def py_bpe_train(word_freqs: dict[str, int], k: int):
    words = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        new: dict[tuple, int] = {}
        for syms, f in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + f
        words = new
    return merges


def py_bpe_encode(word: str, merges) -> list[str]:
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = j, r
        if best is None:
            break
        a, b = syms[best], syms[best + 1]
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


words_strategy = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=5),
    st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(words_strategy)
def test_bpe_train_matches_python(spark, word_freqs):
    text = " ".join(w for w, f in word_freqs.items() for _ in range(f))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = bpe_train(df, 6)
    want = py_bpe_train(word_freqs, 6)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(words_strategy)
def test_bpe_encode_matches_python(spark, word_freqs):
    text = " ".join(w for w, f in word_freqs.items() for _ in range(f))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = py_bpe_train(word_freqs, 6)
    got = bpe_encode(df, merges).collect()[0]["bpe_tokens"]
    want = [
        t for w in text.strip().split() for t in py_bpe_encode(w, merges)
    ]
    assert got == want


def test_bpe_roundtrip_reconstructs_text(spark):
    """Concatenating a word's BPE tokens (stripping the end-of-word
    marker) must reproduce the original word — merges never lose or
    reorder characters."""
    df = spark.createDataFrame(
        [(1, "internationalization tokenization tokenizer tokens")],
        "doc_id long, text string",
    )
    merges = bpe_train(df, 12)
    toks = bpe_encode(df, merges).collect()[0]["bpe_tokens"]
    rebuilt = "".join(toks).replace(EOW, " ").strip()
    assert rebuilt == "internationalization tokenization tokenizer tokens"


def test_bpe_train_validates(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 0"):
        bpe_train(df, -1)
    assert bpe_train(df, 0) == []
