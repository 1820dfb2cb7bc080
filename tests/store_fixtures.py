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


def _scaled_locations(scale: int):
    """scale=1: the 5 canonical locations. scale>1: plus synthetic
    level-2 subregions under US_CA and DK_84 (aggregation shape and
    per-location age-bin sets preserved), so the conformance matrix
    exercises the SAME store logic over a larger key space — the
    reference runs its suite against the real (much larger) Google
    CSVs (R/test_diseasystore.R:545-573); this is the scaled stand-in."""
    locs = list(LOCATIONS)
    bins = dict(AGE_BINS)
    for i in range(5 * (scale - 1)):
        if i % 2 == 0:
            key = f"US_CA_9{i:04d}"
            locs.append((key, "US", "United States", "CA", "California",
                         f"Synth{i}", 2))
            bins[key] = AGE_BINS["US"]
        else:
            key = f"DK_84_9{i:04d}"
            locs.append((key, "DK", "Denmark", "84", "Hovedstaden",
                         f"Synt{i}", 2))
            bins[key] = AGE_BINS["DK"]
    return locs, bins


def write_google_fixtures(
    out_dir: str, gzip_by_age: bool = True, scale: int = 1
) -> str:
    locations, age_bins = _scaled_locations(scale)
    n_dates = len(DATES) * scale
    dates = [
        f"2020-{3 + d // 28:02d}-{d % 28 + 1:02d}" for d in range(n_dates)
    ]
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
        for row in locations:
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
        for li, (loc, *_rest) in enumerate(locations):
            bins = age_bins[loc]
            for di, date in enumerate(dates):
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
        for li, (loc, *_rest) in enumerate(locations):
            w.writerow([loc] + [1000 * (li + 1) + 10 * i for i in range(4)])

    # weather.csv
    with open(os.path.join(out_dir, "weather.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["location_key", "date", "minimum_temperature_celsius",
             "maximum_temperature_celsius"]
        )
        for li, (loc, *_rest) in enumerate(locations):
            for di, date in enumerate(dates):
                w.writerow([loc, date, -5 + li + di * 0.5, 5 + li + di * 0.5])

    return out_dir


ECDC_COUNTRIES = ["Denmark", "Sweden", "Norway"]
ECDC_AGES = ["0-4", "5-14", "15-64", "65+", "total"]
ECDC_INDICATORS = ["ILIconsultationrate", "ARIconsultationrate"]
ECDC_WEEKS = ["2023-W40", "2023-W41", "2023-W42", "2023-W43"]


def write_ecdc_snapshots(
    out_dir: str, snapshot_dates: list[str], scale: int = 1
) -> str:
    """Snapshot-dated CSVs under data/snapshots/<date>_ILIARIRates.csv;
    later snapshots carry an extra week of data. ``scale`` multiplies
    countries (synthetic Country{i}) and weeks (consecutive ISO weeks
    after W43) so the suite can run against a larger fixture."""
    countries = list(ECDC_COUNTRIES) + [
        f"Country{i:03d}" for i in range(3 * (scale - 1))
    ]
    weeks_all = list(ECDC_WEEKS) + [
        f"2023-W{44 + i}" for i in range(4 * (scale - 1))
    ]
    snap_dir = os.path.join(out_dir, "data", "snapshots")
    os.makedirs(snap_dir, exist_ok=True)
    for si, snap in enumerate(sorted(snapshot_dates)):
        weeks = weeks_all[: len(weeks_all) - len(snapshot_dates) + si + 1]
        with open(
            os.path.join(snap_dir, f"{snap}_ILIARIRates.csv"), "w", newline=""
        ) as fh:
            w = csv.writer(fh)
            w.writerow(["countryname", "age", "indicator", "value", "yearweek"])
            for ci, country in enumerate(countries):
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
