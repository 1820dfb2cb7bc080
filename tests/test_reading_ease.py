"""Flesch reading-ease scorer (pipeline/text.reading_ease_scores)."""

from __future__ import annotations

from diseasystore_spark.pipeline.text import reading_ease_scores


def _fre(w: int, s: int, y: int) -> int:
    return 206_835_000 - (1_015_000 * w) // s - (84_600_000 * y) // w


def test_reading_ease_counts_and_score(spark):
    df = spark.createDataFrame(
        [
            (1, "The cat sat. It ran!"),
            (2, "Brrr zzz!"),  # vowel-less words still get 1 syllable
            (3, ""),  # empty -> NULL score
            (4, "word"),  # no terminal punctuation -> 1 sentence
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in reading_ease_scores(df).collect()}

    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    # True Flesch value, pinned absolutely so a mis-scaled coefficient
    # can never hide behind a formula helper that repeats the bug:
    # 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975 -> 119,697,500.
    assert r1["fre_micro"] == 119_697_500
    assert r1["fre_micro"] == _fre(5, 2, 5)

    r2 = out[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (2, 1, 2)
    assert r2["fre_micro"] == _fre(2, 1, 2)

    assert out[3]["n_words"] == 0 and out[3]["fre_micro"] is None

    r4 = out[4]
    assert (r4["n_words"], r4["n_sentences"], r4["n_syllables"]) == (1, 1, 1)
    assert r4["fre_micro"] == _fre(1, 1, 1)


def test_reading_ease_vowel_groups_not_letters(spark):
    # 'queueing' = one vowel GROUP before the g plus none after:
    # 'ueuei' is one run -> 2 groups? lower: q-u-e-u-e-i-n-g ->
    # run 'ueuei' (5 vowels, ONE group), then 'g' — 1 group total...
    # plus trailing nothing. Pin it exactly: groups counted on runs.
    df = spark.createDataFrame(
        [(1, "queueing aloud")], "doc_id bigint, text string"
    )
    r = reading_ease_scores(df).collect()[0]
    # 'queueing' -> 'ueuei' run = 1 group; 'aloud' -> 'a', 'ou' = 2.
    assert r["n_syllables"] == 3
    assert r["n_words"] == 2


def test_reading_ease_null_text_all_null_either_ansi(spark):
    # With ANSI off, size(regexp_extract_all(NULL)) is -1 (legacy
    # sizeOfNull) — the notnull guard must keep ALL four outputs NULL
    # for a NULL text under either conf.
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for ansi in ("false", "true"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            r = reading_ease_scores(df).collect()[0]
            assert (
                r["n_words"],
                r["n_sentences"],
                r["n_syllables"],
                r["fre_micro"],
            ) == (None, None, None, None), ansi
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


# ---------------------------------------------------------------------------
# Property: Spark counts == Python re oracle over random text
# ---------------------------------------------------------------------------

import re as _re  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_text_strategy = st.lists(
    st.text(
        alphabet="abe XY.?!\t\n,'0-", min_size=0, max_size=40
    ),
    min_size=1,
    max_size=8,
)


def _py_counts(text):
    nonspace = r"[^ \t\n\r\f]"
    w = len(_re.findall(nonspace + "+", text))
    s = max(len(_re.findall(r"[.!?]+", text)), 1)
    low = text.lower()
    groups = len(_re.findall(r"[aeiouy]+", low))
    withv = len(_re.findall(f"{nonspace}*[aeiouy]{nonspace}*", low))
    y = groups + (w - withv)
    fre = (
        206_835_000 - (1_015_000 * w) // s - (84_600_000 * y) // w
        if w > 0
        else None
    )
    return (w, s, y, fre)


@settings(max_examples=10, deadline=None)
@given(_text_strategy)
def test_reading_ease_matches_python_regex_oracle(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_sentences"],
            r["n_syllables"],
            r["fre_micro"],
        )
        for r in reading_ease_scores(df).collect()
    }
    want = {i: _py_counts(t) for i, t in enumerate(texts)}
    assert got == want


def test_reading_ease_output_name_collision_raises(spark):
    """An input (or extra_cols) column named like one of the four
    outputs would make the second select ambiguous or silently shadow
    caller data — fail loud, matching the locf_fill / mad_outliers /
    group_quantile_normalize guard pattern (ADVICE r8)."""
    import pytest

    df = spark.createDataFrame(
        [(1, "a b.", 7)], "doc_id bigint, text string, n_words bigint"
    )
    with pytest.raises(ValueError, match="n_words.*already exists"):
        reading_ease_scores(df)

    clean = spark.createDataFrame(
        [(1, "a b.", 7)], "doc_id bigint, text string, fre_micro bigint"
    )
    with pytest.raises(ValueError, match="fre_micro.*already exists"):
        reading_ease_scores(clean)

    ok = spark.createDataFrame([(1, "a b.")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="n_syllables.*already exists"):
        reading_ease_scores(ok, extra_cols=["n_syllables"])
