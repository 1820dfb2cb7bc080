"""CSV fixtures for the Google and ECDC store tests (shapes per
FIXTURES.md §2/§3; deterministic synthetic values)."""

from __future__ import annotations

import csv
import gzip
import os

LOCATIONS = [
    # (location_key, country_code, country_name, sub1_code, sub1_name,
    #  sub2_name, aggregation_level)
    ("US", "US", "United States", "", "", "", 0),
    ("US_CA", "US", "United States", "CA", "California", "", 1),
    ("US_CA_06001", "US", "United States", "CA", "California", "Alameda", 2),
    ("DK", "DK", "Denmark", "", "", "", 0),
    ("DK_84", "DK", "Denmark", "84", "Hovedstaden", "", 1),
]

AGE_BINS = {
    "US": ["0-19", "20-39", "40-59", "60-"],
    "US_CA": ["0-19", "20-39", "40-59", "60-"],
    "US_CA_06001": ["0-19", "20-39", "40-59", "60-"],
    "DK": ["0-29", "30-59", "60-"],
    "DK_84": ["0-29", "30-59", "60-"],
}

DATES = [f"2020-03-{d:02d}" for d in range(1, 15)]


def write_google_fixtures(out_dir: str, gzip_by_age: bool = True) -> str:
    os.makedirs(out_dir, exist_ok=True)

    # index.csv
    with open(os.path.join(out_dir, "index.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            [
                "location_key",
                "country_code",
                "country_name",
                "subregion1_code",
                "subregion1_name",
                "subregion2_name",
                "aggregation_level",
            ]
        )
        for row in LOCATIONS:
            w.writerow([v if v != "" else "" for v in row])

    # by-age.csv(.gz): metric columns new_<metric>_age_<i> + age_bin_<i>
    metrics = [
        "new_hospitalized_patients",
        "new_deceased",
        "new_confirmed",
        "new_intensive_care_patients",
        "new_ventilator_patients",
    ]
    header = ["location_key", "date"]
    for m in metrics:
        header += [f"{m}_age_{i}" for i in range(4)]
    header += [f"age_bin_{i}" for i in range(4)]
    opener = (
        (lambda p: gzip.open(p, "wt", newline=""))
        if gzip_by_age
        else (lambda p: open(p, "w", newline=""))
    )
    suffix = ".gz" if gzip_by_age else ""
    with opener(os.path.join(out_dir, f"by-age.csv{suffix}")) as fh:
        w = csv.writer(fh)
        w.writerow(header)
        for li, (loc, *_rest) in enumerate(LOCATIONS):
            bins = AGE_BINS[loc]
            for di, date in enumerate(DATES):
                row = [loc, date]
                for mi, _m in enumerate(metrics):
                    for ai in range(4):
                        if ai < len(bins):
                            row.append((li + 1) * (di + 1) + mi * 2 + ai)
                        else:
                            row.append("")
                for ai in range(4):
                    row.append(bins[ai] if ai < len(bins) else "")
                w.writerow(row)

    # demographics.csv
    demo_cols = [
        "population_age_00_09",
        "population_age_10_19",
        "population_age_20_29",
        "population_age_80_and_older",
    ]
    with open(os.path.join(out_dir, "demographics.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["location_key"] + demo_cols)
        for li, (loc, *_rest) in enumerate(LOCATIONS):
            w.writerow([loc] + [1000 * (li + 1) + 10 * i for i in range(4)])

    # weather.csv
    with open(os.path.join(out_dir, "weather.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["location_key", "date", "minimum_temperature_celsius",
             "maximum_temperature_celsius"]
        )
        for li, (loc, *_rest) in enumerate(LOCATIONS):
            for di, date in enumerate(DATES):
                w.writerow([loc, date, -5 + li + di * 0.5, 5 + li + di * 0.5])

    return out_dir


ECDC_COUNTRIES = ["Denmark", "Sweden", "Norway"]
ECDC_AGES = ["0-4", "5-14", "15-64", "65+", "total"]
ECDC_INDICATORS = ["ILIconsultationrate", "ARIconsultationrate"]
ECDC_WEEKS = ["2023-W40", "2023-W41", "2023-W42", "2023-W43"]


def write_ecdc_snapshots(out_dir: str, snapshot_dates: list[str]) -> str:
    """Snapshot-dated CSVs under data/snapshots/<date>_ILIARIRates.csv;
    later snapshots carry an extra week of data."""
    snap_dir = os.path.join(out_dir, "data", "snapshots")
    os.makedirs(snap_dir, exist_ok=True)
    for si, snap in enumerate(sorted(snapshot_dates)):
        weeks = ECDC_WEEKS[: len(ECDC_WEEKS) - len(snapshot_dates) + si + 1]
        with open(
            os.path.join(snap_dir, f"{snap}_ILIARIRates.csv"), "w", newline=""
        ) as fh:
            w = csv.writer(fh)
            w.writerow(["countryname", "age", "indicator", "value", "yearweek"])
            for ci, country in enumerate(ECDC_COUNTRIES):
                for ai, age in enumerate(ECDC_AGES):
                    for ii, ind in enumerate(ECDC_INDICATORS):
                        for wi, week in enumerate(weeks):
                            w.writerow(
                                [
                                    country,
                                    age,
                                    ind,
                                    round(
                                        10 * (ci + 1)
                                        + ai
                                        + ii * 0.5
                                        + wi * 0.25,
                                        2,
                                    ),
                                    week,
                                ]
                            )
    return out_dir
