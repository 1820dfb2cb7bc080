"""Z-order layout: mechanical verification that Morton clustering
tightens parquet row-group min/max stats on BOTH dimensions, where a
single-column sort only helps its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from diseasystore_spark.storage.layout import write_zordered, zorder_value


def _avg_span(path_glob: str, col: str, total_span: float) -> float:
    """Mean normalized (max-min) of ``col`` across all row groups."""
    spans = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            spans.append((st.max - st.min) / total_span)
    assert spans
    return sum(spans) / len(spans)


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    # 64x64 uniform grid: the worst case for single-column layouts.
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.parquet(plain)
    )
    write_zordered(df, zord, ["x", "y"], bits=6, num_files=8)

    # Same schema and rows survive the rewrite.
    back = spark.read.parquet(zord)
    assert back.count() == 64 * 64
    assert set(back.columns) == {"x", "y", "payload"}

    px = _avg_span(plain + "/*.parquet", "x", 63.0)
    py = _avg_span(plain + "/*.parquet", "y", 63.0)
    zx = _avg_span(zord + "/*.parquet", "x", 63.0)
    zy = _avg_span(zord + "/*.parquet", "y", 63.0)
    # Single-column sort: x tight, y spans ~everything.
    assert px < 0.3 and py > 0.9
    # Z-order: BOTH dimensions materially tighter than the bad axis.
    assert zx < 0.6 and zy < 0.6, (px, py, zx, zy)


def test_zorder_validates(spark, tmp_path):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="at least one"):
        write_zordered(df, str(tmp_path / "o"), [])
    with pytest.raises(ValueError, match="not in frame"):
        write_zordered(df, str(tmp_path / "o"), ["z"])
    with pytest.raises(ValueError, match="63"):
        zorder_value(["a", "b", "c", "d"], bits=16)
