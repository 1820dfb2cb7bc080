"""Source-connection path helpers.

Parity targets:

- ``source_conn_path`` (``R/source_conn_helpers.R:27-52``): directory
  -> prefix-match a file (finds zipped variants like ``x.csv.gz``);
  URL -> string concatenation.
- ``source_conn_github`` (``R/source_conn_helpers.R:68-175``): resolve
  ``data/snapshots/<date>_X.csv`` to the *closest chronologically
  earlier* snapshot file, from a local git clone (optionally pulled)
  or the GitHub trees API. Network access is import-guarded; the fuzzy
  date matcher is a pure function usable offline.
- ``parse_diseasyconn`` (``R/0_R6_utils.R:174-209``): a conn may be a
  path/URL string, a zero-arg factory callable, or None.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess
import urllib.request
from collections.abc import Callable

DATE_RE = re.compile(r"[0-9]{4}-[0-9]{2}-[0-9]{2}")
URL_RE = re.compile(r"\b(?:https?|ftp)://[-A-Za-z0-9+&@#/%?=~_|!:,.;]*")
GITHUB_API_RE = re.compile(r"https?://api\.github\.com/repos/[\w.-]+/[\w.-]+")


def source_conn_path(source_conn: str, file: str) -> str:
    """Full path to ``file`` under ``source_conn`` (directory or URL).
    In a directory, the first entry *starting with* ``file`` wins, so a
    gzipped variant (``by-age.csv.gz``) satisfies ``by-age.csv``."""
    if os.path.isdir(source_conn):
        matches = sorted(
            entry for entry in os.listdir(source_conn) if entry.startswith(file)
        )
        if not matches:
            raise FileNotFoundError(f"{file} could not be found in {source_conn}")
        return os.path.join(source_conn, matches[0])
    if URL_RE.match(source_conn):
        return f"{source_conn.rstrip('/')}/{file}"
    raise ValueError("source_conn could not be parsed to valid directory or URL")


def fuzzy_date_match(
    files: list[str], wanted_date: datetime.date, pattern: str
) -> str | None:
    """Closest chronologically-earlier dated file
    (``R/source_conn_helpers.R:83-90``): keep files matching
    ``pattern`` (with the date wildcarded), parse their dates, filter
    ``file_date <= wanted_date``, take the max."""
    rx = re.compile(pattern)
    best: tuple[datetime.date, str] | None = None
    for f in files:
        if not rx.search(f):
            continue
        m = DATE_RE.search(f)
        if not m:
            continue
        d = datetime.date.fromisoformat(m.group(0))
        if d <= wanted_date and (best is None or d > best[0]):
            best = (d, f)
    return best[1] if best else None


def source_conn_github(source_conn: str, file: str, pull: bool = True) -> str:
    """Resolve a snapshot-dated file in a git clone or via the GitHub
    API (``R/source_conn_helpers.R:68-175``)."""
    relative_path = os.path.dirname(file)
    base = os.path.basename(file)
    m = DATE_RE.search(base)
    if not m:
        raise ValueError(f"no date found in requested file name: {file}")
    wanted = datetime.date.fromisoformat(m.group(0))
    # Literal file name with the date component wildcarded to the date
    # regex (the reference's file_pattern, :80).
    pattern = re.escape(base).replace(re.escape(m.group(0)), DATE_RE.pattern)

    if os.path.isdir(source_conn):
        if pull:
            if not os.path.isdir(os.path.join(source_conn, ".git")):
                raise ValueError(
                    f"The directory {source_conn} does not appear to be a "
                    "git repository. Cannot pull."
                )
            subprocess.run(
                ["git", "-C", source_conn, "pull"],
                check=False,
                capture_output=True,
            )
        search_dir = os.path.join(source_conn, relative_path)
        entries = os.listdir(search_dir) if os.path.isdir(search_dir) else []
        match = fuzzy_date_match(entries, wanted, pattern)
        if match is None:
            raise FileNotFoundError(
                f"no snapshot matching {base} at or before {wanted} in {search_dir}"
            )
        return os.path.join(search_dir, match)

    if GITHUB_API_RE.match(source_conn):
        def api(url: str) -> object:
            req = urllib.request.Request(url)
            token = os.environ.get("GITHUB_PAT")
            if token:
                req.add_header("Authorization", f"Bearer {token}")
            with urllib.request.urlopen(req) as resp:  # noqa: S310
                return json.load(resp)

        parent = api(f"{source_conn}/contents/{os.path.dirname(relative_path)}")
        dir_sha = next(
            e["sha"]
            for e in parent
            if e["name"] == os.path.basename(relative_path)
        )
        tree = api(f"{source_conn}/git/trees/{dir_sha}")
        match = fuzzy_date_match(
            [e["path"] for e in tree["tree"]], wanted, pattern
        )
        if match is None:
            raise FileNotFoundError(f"no snapshot matching {base} <= {wanted}")
        meta = api(f"{source_conn}/contents/{relative_path}/{match}")
        return meta["download_url"]

    raise ValueError(
        "source_conn could not be parsed to valid GitHub repository or "
        "GitHub API URL"
    )


def parse_diseasyconn(conn: object, type_: str = "source_conn") -> object:
    """Conn polymorphism: callable factory -> call it; str/path -> as
    is; None -> None (``R/0_R6_utils.R:174-209``)."""
    if conn is None or conn == "":
        return None
    if isinstance(conn, Callable):
        return conn()
    return conn
