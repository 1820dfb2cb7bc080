"""Generate a deterministic sf1-scale dataset under .sf1/ (gitignored)
for the scaling study in SCALE.md.

The driver testdata stops at sf0.1 and is read-only, so sf1 is
synthesized here, self-similar to the driver tables:

- relational tables (orders/customer/supplier/lineitem/events) are
  the sf0.1 tables replicated 10x with key-space offsets — the engine
  workloads (SCD2 writes, prevalence, sessionization) scale with row
  count and key cardinality, which replication preserves; dimension
  tables (nation/region/part) are copied as-is;
- documents and embeddings are generated FRESH (seeded) with the same
  shape as the driver generator's output (vocab/length/lang mix,
  planted exact- and near-duplicates; clustered unit vectors) —
  replicating text would turn every replica group into a near-dup
  clique and quadratically distort the dedup workloads, which is
  exactly what a scaling measurement must not do.

Usage: python scripts/make_sf1.py [out_dir]   (default /root/repo/.sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
FACTOR = 10

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "shuffle", "slow", "small",
    "sort", "spark", "spill", "stage", "table", "task", "value",
]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def replicate(table: str, out: Path, offsets: dict[str, int]) -> None:
    """Union FACTOR copies with per-column key offsets (copy 0 is the
    original, so sf0.1 is a strict subset of sf1)."""
    t = pq.read_table(SRC / f"{table}.parquet")
    chunks = []
    for i in range(FACTOR):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in offsets and i > 0:
                arr = col.to_numpy(zero_copy_only=False) + i * offsets[name]
                cols[name] = pa.array(arr, type=col.type)
            else:
                cols[name] = col
        chunks.append(pa.table(cols))
    pq.write_table(pa.concat_tables(chunks), out / f"{table}.parquet")


def gen_documents(out: Path, n_docs: int, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    for _ in range(n_docs):
        n_tok = int(rng.integers(10, 101))
        toks = rng.choice(VOCAB, size=n_tok)
        texts.append(" ".join(toks))
    # planted exact duplicates (~0.16%) and near-duplicates (~1%):
    # same rates as the driver generator's observable output
    for _ in range(n_docs // 600):
        i, j = rng.integers(0, n_docs, size=2)
        texts[int(i)] = texts[int(j)]
    for _ in range(n_docs // 100):
        i, j = rng.integers(0, n_docs, size=2)
        toks = texts[int(j)].split()
        for _ in range(max(1, len(toks) // 10)):
            toks[int(rng.integers(0, len(toks)))] = str(rng.choice(VOCAB))
        texts[int(i)] = " ".join(toks)
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = np.array([f"src{int(x)}" for x in rng.integers(0, 20, n_docs)])
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(sources),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), type=pa.int64()
                ),
            }
        ),
        out / "documents.parquet",
    )


def gen_embeddings(
    out: Path, n_vecs: int, dim: int = 64, n_clusters: int = 10, seed: int = 11
) -> None:
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n_vecs)
    vecs = centers[labels] + rng.normal(scale=0.45, size=(n_vecs, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vecs), type=pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.astype(np.int32), type=pa.int32()),
            }
        ),
        out / "embeddings.parquet",
    )


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1")
    out.mkdir(parents=True, exist_ok=True)
    import shutil

    for t in ("region", "nation"):
        shutil.copy(SRC / f"{t}.parquet", out / f"{t}.parquet")
    # part scales too (round 6): q140's dirty-registry corpus is built
    # from part, so a copied-through part made its sf1 row vacuous.
    # Replication keeps sf0.1 as a strict prefix (offsets preserve the
    # original keys) and lineitem.l_partkey still resolves.
    replicate("part", out, {"p_partkey": 20_000})
    replicate("customer", out, {"c_custkey": 20_000})
    replicate("supplier", out, {"s_suppkey": 2_000})
    replicate(
        "orders", out, {"o_orderkey": 200_000, "o_custkey": 20_000}
    )
    replicate(
        "lineitem",
        out,
        {"l_orderkey": 200_000, "l_suppkey": 2_000},
    )
    replicate("events", out, {"event_id": 200_000, "user_id": 100_000})
    gen_documents(out, 50_000)
    gen_embeddings(out, 20_000)
    print(f"sf1 dataset written to {out}")


if __name__ == "__main__":
    main()
