"""JSONL source: explicit-schema parse, corrupt-line quarantine,
round-trip identity — the text+from_json formulation that avoids the
native reader's corrupt-column-only query restriction."""

from __future__ import annotations

import pytest


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    from pyspark.sql import functions as F

    from diseasystore_spark.sources.jsonl import (
        CORRUPT_COL,
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    rows = [(i, f"text {i}", i * 1.5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    d = str(tmp_path / "corpus")
    write_jsonl(df, d, n_files=2)
    with open(f"{d}/injected.json", "w") as fh:
        fh.write("garbage line\n")
        fh.write('{"doc_id": 7, "text": "ok", "score": 0.5}\n')
        fh.write('{"doc_id": "seven", "text": "typed wrong", "score": 1}\n')

    back = read_jsonl(spark, d, "doc_id bigint, text string, score double")
    clean, bad = split_corrupt(back)
    # the type-violation line is quarantined (raw line captured) even
    # though its parsable fields survive in the wide frame
    assert bad.count() == 2
    raws = {r["raw_line"] for r in bad.collect()}
    assert "garbage line" in raws
    assert any("seven" in r for r in raws)
    assert clean.count() == 201
    got = {
        r["doc_id"]: (r["text"], r["score"])
        for r in clean.where("doc_id != 7 OR text = 'ok'").collect()
    }
    assert got[0] == ("text 0", 0.0)
    assert got[199] == ("text 199", 298.5)
    assert CORRUPT_COL not in clean.columns

    # querying ONLY the quarantine side works without caching (the
    # restriction this formulation exists to avoid)
    assert bad.select("raw_line").count() == 2

    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, d, f"doc_id bigint, {CORRUPT_COL} string")
