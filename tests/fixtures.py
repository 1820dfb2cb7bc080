"""Test fixtures mirroring the reference's mtcars-derived tables.

Reference fixture shapes: ``tests/testthat/test-truncate_interlace.R:5-83``
and the dummy store ``tests/testthat/test-DiseasystoreBase.R:107-145``
(shapes per FIXTURES.md §4/§5; values are synthetic but deterministic).
"""

from __future__ import annotations

import datetime

import pandas as pd

D = datetime.date
N_KEYS = 32


def base_cars() -> pd.DataFrame:
    """32 deterministic 'cars' with numeric payloads standing in for
    mpg/cyl/wt/vs/qsec."""
    rows = []
    for i in range(1, N_KEYS + 1):
        rows.append(
            {
                "key_name": f"car_{i:02d}",
                "mpg": 10.0 + i * 0.7,
                "cyl": float([4, 6, 8][i % 3]),
                "wt": 1.5 + i * 0.11,
                "vs": float(i % 2),
                "qsec": 14.0 + i * 0.3,
            }
        )
    return pd.DataFrame(rows)


def interlace_xyz(spark):
    """The x/y/z secondary tables with staggered validity changes
    (``test-truncate_interlace.R:12-54``)."""
    data = base_cars()

    def frame(pdf, valid_from, valid_until, **mutate):
        out = pdf.copy()
        for k, fn in mutate.items():
            out[k] = fn(out[k])
        out["valid_from"] = valid_from
        out["valid_until"] = valid_until
        return out

    x_base = data[["key_name", "mpg", "cyl"]]
    x = pd.concat(
        [
            frame(x_base.head(10), D(1990, 1, 1), None),
            frame(x_base.tail(22), D(1990, 1, 1), D(2000, 1, 1)),
            frame(x_base.tail(22), D(2000, 1, 1), None, mpg=lambda s: 0.9 * s),
        ]
    )
    y_base = data[["key_name", "wt", "vs"]]
    y = pd.concat(
        [
            frame(y_base.head(22), D(1990, 1, 1), None),
            frame(y_base.tail(10), D(1990, 1, 1), D(2010, 1, 1)),
            frame(y_base.tail(10), D(2010, 1, 1), None, wt=lambda s: 1.1 * s),
        ]
    )
    z_base = data[["key_name", "qsec"]]
    z = pd.concat(
        [
            frame(z_base.head(22), D(1990, 1, 1), None),
            frame(z_base.tail(10), D(1990, 1, 1), None),
            frame(z_base.iloc[10:22], D(1990, 1, 1), D(2020, 1, 1)),
            frame(z_base.iloc[10:22], D(2020, 1, 1), None, qsec=lambda s: 1.1 * s),
        ]
    )

    def to_spark(pdf):
        sdf = spark.createDataFrame(pdf)
        return sdf.withColumns(
            {
                "valid_from": sdf["valid_from"].cast("date"),
                "valid_until": sdf["valid_until"].cast("date"),
            }
        )

    return to_spark(x), to_spark(y), to_spark(z)


def primaries(spark):
    data = base_cars()[["key_name"]]

    def make(valid_from, valid_until):
        pdf = data.copy()
        pdf["valid_from"] = valid_from
        pdf["valid_until"] = valid_until
        sdf = spark.createDataFrame(pdf)
        return sdf.withColumns(
            {
                "valid_from": sdf["valid_from"].cast("date"),
                "valid_until": sdf["valid_until"].cast("date"),
            }
        )

    p1 = make(D(1985, 1, 1), None)
    p2 = make(D(1995, 1, 1), D(2005, 1, 1))
    p3 = make(D(2005, 1, 1), D(2015, 1, 1))
    return p1, p2, p3


def dummy_feature_pdf(n: int = 1, today: D | None = None) -> pd.DataFrame:
    """The dummy-store source: 32 cars repeated n times with row_id and
    2-day validity windows (FIXTURES.md §4)."""
    today = today or D.today()
    base = base_cars()
    frames = []
    for rep in range(n):
        pdf = base.copy()
        pdf["row_id"] = [i + rep * N_KEYS for i in range(1, N_KEYS + 1)]
        pdf["car"] = pdf["key_name"] + " " + pdf["row_id"].astype(str)
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)
