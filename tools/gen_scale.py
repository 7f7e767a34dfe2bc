"""Scale-replica generator for the SCALING.md measured curve.

The driver testdata stops at sf0.1 (~600k lineitem rows). To MEASURE the
engine's scaling behavior instead of asserting it, this script builds
larger replicas under .scale/ (gitignored):

- Star schema + events: N shifted-key copies of the driver's sf0.1
  parquet (keys offset per copy so joins keep the exact driver fanout
  and value distributions; events shift ts by 31 days per copy — the
  "longer history" growth axis — with user/event ids offset so per-user
  session structure is copy-local).
- documents / embeddings: regenerated from the observed driver process
  (30-word uniform vocab, 10-100 words/doc, ~5% near-dup docs = parent
  copy with ~3 word replacements + ' dup' suffix, ~0.16% exact dups;
  embeddings = unit-normalized gaussians with a small label tilt
  matching the driver's 0.009 within-label cosine, plus 2% perturbed
  near-copies). Shifted-copy replication would corrupt near-dup pair
  density (every doc would gain N-1 exact twins), so these two tables
  are generated, not copied — the generator is CALIBRATED by building a
  my-sf0.1 replica (mult=1) and comparing q63/q66 candidate-pair counts
  and runtimes against the driver's sf0.1 (see SCALING.md).

Usage: python tools/gen_scale.py <mult> <out_dir>
  mult = how many sf0.1 copies (10 -> sf1), out_dir e.g. .scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast row the "
    "agg key query a scan batch"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_star(con: duckdb.DuckDBPyConnection, mult: int, out: str) -> None:
    copies = f"(SELECT unnest(range({mult})) AS cp)"
    for t in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
    jobs = {
        "part": "SELECT p_partkey + cp * 20000 AS p_partkey, p_name, "
        "p_brand, p_type, p_size, p_retailprice",
        "customer": "SELECT c_custkey + cp * 15000 AS c_custkey, "
        "printf('Customer#%09d', c_custkey + cp * 15000) AS c_name, "
        "c_nationkey, c_acctbal, c_mktsegment",
        "supplier": "SELECT s_suppkey + cp * 1000 AS s_suppkey, "
        "printf('Supplier#%09d', s_suppkey + cp * 1000) AS s_name, "
        "s_nationkey, s_acctbal",
        "orders": "SELECT o_orderkey + cp * 150000 AS o_orderkey, "
        "o_custkey + cp * 15000 AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority",
        "lineitem": "SELECT l_orderkey + cp * 150000 AS l_orderkey, "
        "l_partkey + cp * 20000 AS l_partkey, "
        "l_suppkey + cp * 1000 AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate",
        "events": "SELECT event_id + cp * 100000 AS event_id, "
        "ts + cp * INTERVAL '31 days' AS ts, "
        "user_id + cp * 1500 AS user_id, event_type, value, props",
    }
    for t, sel in jobs.items():
        con.execute(
            f"COPY ({sel} FROM read_parquet('{SRC}/{t}.parquet'), {copies}) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )


def gen_documents(n_docs: int, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.0016:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.05 + 0.0016:  # near-dup: mutate a parent
            words = [w for w in texts[rng.integers(0, i)].split() if w != "dup"]
            for _ in range(3):
                if words:
                    words[rng.integers(0, len(words))] = VOCAB[
                        rng.integers(0, len(VOCAB))
                    ]
            texts.append(" ".join(words) + " dup")
        else:
            n_words = int(rng.integers(10, 101))
            idx = rng.integers(0, len(VOCAB), n_words)
            texts.append(" ".join(VOCAB[j] for j in idx))
    langs = rng.choice(LANGS, n_docs, p=LANG_P)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([str(x) for x in langs]),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(n_vecs: int, out: str, dim: int = 64, seed: int = 43) -> None:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((10, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vecs)
    # within-label cosine of normalized (g + w*c): w^2/(w^2 + dim);
    # driver data shows ~0.009 -> w ~ 0.76 at dim=64
    X = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    X += 0.76 * centers[labels]
    for i in range(20, n_vecs):  # 2% near-copies of an earlier vector
        if rng.random() < 0.02:
            j = int(rng.integers(0, i))
            X[i] = X[j] + 0.05 * rng.standard_normal(dim).astype(np.float32)
            labels[i] = labels[j]
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                X.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array([int(x) for x in labels], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main() -> None:
    mult = int(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_star(con, mult, out)
    gen_documents(5000 * mult, out)
    gen_embeddings(2000 * mult, out)
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
