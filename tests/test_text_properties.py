"""Property-based testing of the text-pipeline packing/chunking
operators against pure-Python oracles (random corpora via hypothesis).

These ops are driver-contract-verified against DuckDB at one dataset;
the properties here pin the SEMANTICS on adversarial shapes (tokens
longer than the budget, single-token docs, duplicate token runs)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from diseasystore_spark.pipeline.sample import pack_sequences
from diseasystore_spark.pipeline.text import chunk_documents

# lowercase words, occasionally longer than the chunk budget below
word = st.text(alphabet="abcdef", min_size=1, max_size=30)
doc = st.lists(word, min_size=1, max_size=25).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=12)


def py_chunks(text: str, max_chars: int) -> list[str]:
    """Greedy-by-offset chunking oracle: token with start offset s in
    the space-joined doc goes to raw chunk floor(s/max_chars); ids are
    then densified in order."""
    toks = text.strip().split()
    out: dict[int, list[str]] = {}
    pos = 0
    for t in toks:
        out.setdefault(pos // max_chars, []).append(t)
        pos += len(t) + 1
    return [" ".join(out[k]) for k in sorted(out)]


@settings(max_examples=20, deadline=None)
@given(corpus=corpus, max_chars=st.integers(min_value=5, max_value=40))
def test_chunking_matches_python_oracle(spark, corpus, max_chars):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got: dict[int, dict[int, str]] = {}
    for r in chunk_documents(df, max_chars=max_chars).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    for i, t in rows:
        expect = py_chunks(t, max_chars)
        chunks = got.get(i, {})
        assert sorted(chunks) == list(range(len(expect))), (t, chunks)
        assert [chunks[k] for k in sorted(chunks)] == expect


def _py_pack_stratum(
    items: list[tuple[str, int]], budget: int
) -> dict[str, int]:
    """pack_sequences oracle for one stratum: md5('|'+key)-prefix
    order, cumulative start offsets, floor(start/budget), densified."""
    order = sorted(
        items, key=lambda kv: (hashlib.md5(f"|{kv[0]}".encode()).hexdigest()[:8], kv[0])
    )
    start, raw = 0, []
    for k, n in order:
        raw.append((k, start // budget))
        start += n
    seen: dict[int, int] = {}
    out = {}
    for k, r in raw:
        out[k] = seen.setdefault(r, len(seen))
    return out


def py_pack(
    items: list[tuple[str, int]], budget: int, auto_strata: int = 64
) -> dict[str, int]:
    """Full oracle for the strata=None default: synthetic md5 strata
    (salt-namespaced, independent of the order hash), per-stratum
    greedy packing, then global contiguity via per-stratum offsets in
    stratum order."""
    groups: dict[int, list[tuple[str, int]]] = {}
    for k, n in items:
        s = (
            int(hashlib.md5(f"|stratum|{k}".encode()).hexdigest()[:8], 16)
            % auto_strata
        )
        groups.setdefault(s, []).append((k, n))
    out: dict[str, int] = {}
    offset = 0
    for s in sorted(groups):
        local = _py_pack_stratum(groups[s], budget)
        for k, p in local.items():
            out[k] = p + offset
        offset += max(local.values()) + 1
    return out


@settings(max_examples=15, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=30),
    budget=st.integers(min_value=4, max_value=64),
)
def test_pack_sequences_matches_python_oracle(spark, sizes, budget):
    rows = [(f"d{i:03d}", sizes[i]) for i in range(len(sizes))]
    df = spark.createDataFrame(rows, "doc_id string, n bigint")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, "n", budget, "doc_id").collect()
    }
    assert got == py_pack(rows, budget)


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=6, max_value=20),
)
def test_near_dup_groups_property(spark, seed, n_docs):
    """For random corpora with planted exact duplicates and light
    mutations, the collapse-first composition must agree with
    components over the full corpus pair list on every
    pair-participating doc, cover every doc exactly once, and have
    component = min id of its cluster."""
    import random

    from diseasystore_spark.pipeline.dedup import (
        dedup_components,
        jaccard_pairs,
        near_dup_groups,
    )

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 15)))
        for _ in range(n_docs)
    ]
    # plant exact duplicates and one-token mutations
    for _ in range(n_docs // 3):
        i, j = rng.randrange(n_docs), rng.randrange(n_docs)
        texts[i] = texts[j]
    for _ in range(n_docs // 4):
        i, j = rng.randrange(n_docs), rng.randrange(n_docs)
        toks = texts[j].split()
        toks[rng.randrange(len(toks))] = rng.choice(vocab)
        texts[i] = " ".join(toks)
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    got = {
        r["doc_id"]: r["component"]
        for r in near_dup_groups(df, threshold=0.3).collect()
    }
    assert sorted(got) == list(range(n_docs))
    full = {
        r["id"]: r["component"]
        for r in dedup_components(jaccard_pairs(df, threshold=0.3)).collect()
    }
    for doc_id, comp in full.items():
        assert got[doc_id] == comp, (seed, doc_id)
    # component is always the min id of its member set
    members: dict[int, list[int]] = {}
    for doc_id, comp in got.items():
        members.setdefault(comp, []).append(doc_id)
    for comp, ms in members.items():
        assert comp == min(ms)


# small alphabet + short lines maximize cross-document line collisions
line = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=3
).map(" ".join)
lined_doc = st.lists(line, min_size=1, max_size=6).map("\n".join)
lined_corpus = st.lists(lined_doc, min_size=1, max_size=8)


def py_dedup_lines(
    docs: list[tuple[int, str]], min_chars: int
) -> dict[int, tuple[str, int, int]]:
    """Global keep-first oracle: scan (id, pos) ascending; a subject
    line (len >= min_chars) is kept only at its first sighting."""
    seen: set[str] = set()
    out: dict[int, tuple[str, int, int]] = {}
    for i, t in sorted(docs):
        kept = []
        lines = t.split("\n")
        for ln in lines:
            if len(ln) < min_chars:
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[i] = ("\n".join(kept), len(lines), len(kept))
    return out


@settings(max_examples=20, deadline=None)
@given(corpus=lined_corpus, min_chars=st.integers(min_value=1, max_value=4))
def test_dedup_lines_matches_python_oracle(spark, corpus, min_chars):
    from diseasystore_spark.pipeline.text import dedup_lines

    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    expect = py_dedup_lines(rows, min_chars)
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_lines_kept"])
        for r in dedup_lines(df, min_chars=min_chars).collect()
    }
    assert got == expect


# adversarial normalization inputs: mixed case, every whitespace
# variant (incl. vertical tab), C0 controls, DEL, interior runs
messy_char = st.sampled_from(
    list("aBcZ09.!") + [" ", "\t", "\n", "\r", "\f", "\x0b", "\x01", "\x1f", "\x7f"]
)
messy_text = st.lists(messy_char, min_size=0, max_size=60).map("".join)


def py_normalize(t: str, lowercase: bool = True) -> str:
    """Pure-Python oracle with the SAME explicit character classes the
    operator uses (Python re's \\s also diverges from RE2 on \\x0b,
    which is exactly why the operator never uses the shorthand)."""
    import re as _re

    out = _re.sub(r"[ \t\n\f\r\x0B]+", " ", t)
    out = _re.sub(r"[\x00-\x1F\x7F]", "", out)
    out = out.strip(" ")
    return out.lower() if lowercase else out


@settings(max_examples=50, deadline=None)
@given(texts=st.lists(messy_text, min_size=1, max_size=10))
def test_normalize_text_matches_python_oracle(spark, texts):
    from diseasystore_spark.pipeline.text import normalize_text

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text_norm"], r["n_chars_norm"], r["changed"])
        for r in normalize_text(df).collect()
    }
    for i, t in rows:
        expect = py_normalize(t)
        assert got[i] == (expect, len(expect), expect != t), repr(t)


# fragments that compose into PII-ish and near-miss strings
pii_frag = st.sampled_from([
    "a@b.io", "x.y+z@mail-host.org", "not@an@email", "user@",
    "10.0.0.1", "999.999.999.999", "1.2.3", "1.2.3.4.5",
    "555-123-4567", "555.123.4567", "55-123-4567", "555-12-34567",
    "123-45-6789", "123-456-789", "word", "42", "...", "a-b",
])
pii_text = st.lists(pii_frag, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(pii_text, min_size=1, max_size=8))
def test_redact_pii_matches_python_re(spark, texts):
    """Java regex must agree with Python re on the portable pattern
    subset (ASCII classes, \\b, bounded repetition) over adversarial
    near-miss PII — the same agreement the DuckDB RE2 oracle relies
    on."""
    import re as _re

    from diseasystore_spark.pipeline.pii import (
        DEFAULT_PII_PATTERNS,
        redact_pii,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for i, t in rows:
        red = t
        for name, (rx, tok) in DEFAULT_PII_PATTERNS.items():
            assert got[i][f"n_{name}"] == len(_re.findall(rx, t)), (name, t)
            red = _re.sub(rx, tok, red)
        assert got[i]["text_redacted"] == red, repr(t)


def test_perplexity_split_equals_naive_window(spark):
    """The two-level distributed rank must reproduce the naive
    row_number() OVER (PARTITION BY lang ORDER BY score DESC, id)
    terciles exactly, including under heavy language skew and heavy
    score ties."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from diseasystore_spark.pipeline.text import (
        perplexity_split,
        unigram_logprob_score,
    )

    rng = random.Random(17)
    words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(400):
        lang = "en" if i % 10 else rng.choice(["de", "zh"])  # 90% en
        # small word pool -> many tied scores
        rows.append(
            (i, " ".join(rng.choices(words[:5], k=rng.randrange(2, 6))), lang)
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {
        r["doc_id"]: (r["lang"], r["score_micro"], r["bucket"])
        for r in perplexity_split(docs, coarse_div=7).collect()
    }

    scored = unigram_logprob_score(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    naive = (
        scored.withColumn("r", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("lang"))
        )
        .withColumn(
            "bucket",
            F.when((F.col("r") - 1) * 3 < F.col("n"), "head")
            .when((F.col("r") - 1) * 3 < 2 * F.col("n"), "middle")
            .otherwise("tail"),
        )
    )
    want = {
        r["doc_id"]: (r["lang"], r["score_micro"], r["bucket"])
        for r in naive.collect()
    }
    assert got == want


def test_gopher_rules_match_python_oracle(spark):
    """Randomized docs (whitespace runs, unicode ellipssis/bullets,
    digits, short/long) vs a pure-Python evaluation of all 7 rules."""
    import random
    import re

    from diseasystore_spark.pipeline.text import (
        GOPHER_STOPWORDS,
        gopher_quality_filter,
    )

    rng = random.Random(7)
    vocab = ["the", "be", "to", "of", "and", "word", "#tag", "12",
             "x", "…", "alpha", "Beta9", "-", "•"]
    docs = []
    for i in range(60):
        n_lines = rng.randint(1, 5)
        lines = []
        for _ in range(n_lines):
            toks = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
            line = (" " * rng.randint(1, 2)).join(toks)
            if rng.random() < 0.3:
                line = "• " + line
            if rng.random() < 0.3:
                line += "…" if rng.random() < 0.5 else "..."
            lines.append(line)
        docs.append((i, "\n".join(lines)))

    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(
            spark.createDataFrame(docs, "doc_id long, text string"),
            min_words=5,
        ).collect()
    }
    for i, text in docs:
        # Spark/DuckDB trim() strips SPACES only (not \n) — the
        # module-wide tokenization convention; mirror it exactly
        w = re.split(r"\s+", text.strip(" "))
        lines = text.split("\n")
        n_words, n_lines = len(w), len(lines)
        word_chars = sum(len(t) for t in w)
        alpha = sum(1 for t in w if re.search("[A-Za-z]", t))
        stops = sum(1 for s in GOPHER_STOPWORDS if s in w)
        bullets = sum(
            1 for x in lines if x.startswith("•") or x.startswith("- ")
        )
        ell = sum(
            1 for x in lines if x.endswith("…") or x.endswith("...")
        )
        sym = text.count("#") + text.count("…")
        r = out[i]
        assert r["n_words"] == n_words and r["n_lines"] == n_lines, i
        assert r["r_words"] == (5 <= n_words <= 100_000), i
        assert r["r_mean_len"] == (
            3 * n_words <= word_chars <= 10 * n_words
        ), i
        assert r["r_symbols"] == (100 * sym <= 10 * n_words), i
        assert r["r_bullets"] == (100 * bullets < 90 * n_lines), i
        assert r["r_ellipsis"] == (100 * ell < 30 * n_lines), i
        assert r["r_alpha"] == (100 * alpha >= 80 * n_words), i
        assert r["r_stopwords"] == (stops >= 2), i
        assert r["passed"] == all(
            r[c] for c in r.asDict() if c.startswith("r_")
        ), i


def test_c4_clean_matches_python_oracle(spark):
    """Randomized docs vs pure-Python C4 rules (line keep set, page
    verdict, reassembly order)."""
    import random
    import re

    from diseasystore_spark.pipeline.text import c4_clean

    rng = random.Random(11)
    words = ["one", "two", "three", "javascript", "Lorem", "ipsum",
             "brace", "word", "x"]
    docs = []
    for i in range(60):
        lines = []
        for _ in range(rng.randint(1, 6)):
            toks = [rng.choice(words) for _ in range(rng.randint(0, 9))]
            line = " ".join(toks)
            r = rng.random()
            if r < 0.5:
                line += "."
            elif r < 0.6:
                line += '!"'
            if rng.random() < 0.1:
                line += " {"
            lines.append(line)
        docs.append((i, "\n".join(lines)))

    out = {
        r["doc_id"]: r
        for r in c4_clean(
            spark.createDataFrame(docs, "doc_id long, text string"),
            badwords=("brace",),
        ).collect()
    }
    for i, text in docs:
        lines = text.split("\n")
        kept = [
            x for x in lines
            if len(re.split(r"\s+", x.strip(" "))) >= 5
            and re.search(r'[.!?]["\']?$', x)
            and "javascript" not in x.lower()
        ]
        clean = "\n".join(kept)
        sentences = len(re.split(r"[.!?]", clean)) - 1
        verdict = (
            "{" not in text and "}" not in text
            and "lorem ipsum" not in text.lower()
            and not re.search(r"\bbrace\b", text.lower())
            and sentences >= 3
        )
        r = out[i]
        assert r["text_clean"] == clean, i
        assert r["n_lines"] == len(lines), i
        assert r["n_lines_kept"] == len(kept), i
        assert r["kept"] == verdict, i


def test_bigram_lm_scores_orders_natural_above_garbled(spark):
    """An LM trained on patterned text scores in-distribution docs
    above shuffled/garbled ones; short docs emit nothing; per-doc
    totals match a Python replay of the exact formula."""
    import math
    from collections import Counter

    import pytest

    from diseasystore_spark.pipeline.text import bigram_lm_scores

    train_rows = [(i, "the cat sat on the mat " * 5) for i in range(10)]
    test_rows = [
        (100, "the cat sat on the mat"),        # in-distribution
        (101, "mat the on sat cat the"),        # garbled order
        (102, "zebra quark flux"),              # OOV
        (103, "one"),                           # single token: no bigrams
    ]
    df = spark.createDataFrame(
        train_rows + test_rows, "doc_id long, text string"
    )
    train = df.where("doc_id < 100")
    got = {
        r["doc_id"]: r
        for r in bigram_lm_scores(df, train_df=train).collect()
    }
    assert 103 not in got
    assert got[100]["avg_logp"] > got[101]["avg_logp"] > got[102]["avg_logp"]

    # python replay for doc 100
    toks = [r[1].split() for r in train_rows]
    uni = Counter(w for t in toks for w in t)
    bi = Counter()
    for t in toks:
        for a, b in zip(t, t[1:]):
            bi[(a, b)] += 1
    T, V = sum(uni.values()), len(uni)
    words = test_rows[0][1].split()
    lam = 0.7
    want = 0
    for a, b in zip(words, words[1:]):
        p_bi = bi[(a, b)] / uni[a] if uni.get(a) and bi.get((a, b)) else 0.0
        p_un = (uni.get(b, 0) + 1.0) / (T + V + 1)
        want += math.floor(math.log(lam * p_bi + (1.0 - lam) * p_un) * 1e6)
    assert got[100]["logp_micro"] == want
    assert got[100]["n_bigrams"] == len(words) - 1

    with pytest.raises(ValueError, match="lam"):
        bigram_lm_scores(df, lam=1.0)
