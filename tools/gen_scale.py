"""Scale the driver testdata by an integer factor for scale-evidence runs.

The driver ships sf{0.001,0.01,0.1}; the scaling claims in SCALING.md are
plan-audited but unmeasured above sf0.1 (r5 VERDICT #4). This tool builds
an sfN directory INSIDE the repo (never touching /root/testdata) by
replicating sf0.1 `factor` times with disjoint key spaces, so every
operator sees `factor`x rows AND `factor`x keys:

- every table key is offset per replica by a power-of-ten ceiling
  (divisible by 100, so vec_id % 25 == 0 query-set density and similar
  modulus selections scale exactly);
- foreign keys move together (orders.o_custkey uses customer's ceiling,
  lineitem's three FKs use orders/part/supplier's, events.user_id uses
  customer's — pv_join/id2title joins stay FK-closed);
- document text is word-shuffled per replica (seeded, deterministic), so
  replicas keep the token/length/lang distributions but are NOT near-dups
  of their originals — replicating verbatim would fabricate O(factor^2)
  near-dup pairs and corrupt the dedup scaling measurement;
- embeddings get seeded Gaussian jitter (sigma = 5% of the global value
  scale) per replica — a pure copy would be an exact-cosine duplicate
  (scaling a vector leaves cosine invariant, so jitter, not rescaling);
- region/nation stay fixed (dimension tables are fixed in TPC-H scaling
  too).

Timestamps are left as-is: 10x rows in the same calendar span = 10x
per-hour density, which is how event volume actually grows.

Usage: python tools/gen_scale.py --factor 10 \
         --src /root/testdata/sf0.1 --out .scale/sf1
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _ceiling(max_key: int) -> int:
    c = 100  # >= 100 keeps offsets divisible by 25 (query-set modulus)
    while c <= max_key:
        c *= 10
    return c


def _offset_col(tbl: pa.Table, col: str, off: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, pc.add(tbl.column(col), off))


def _shuffle_text(texts: list, doc_ids: list, rep: int) -> list:
    out = []
    for t, d in zip(texts, doc_ids):
        rng = random.Random((int(d) << 8) | rep)
        toks = t.split(" ")
        rng.shuffle(toks)
        out.append(" ".join(toks))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scale/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    src = {
        t: pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    }
    ceil = {
        t: _ceiling(pc.max(src[t].column(k)).as_py())
        for t, k in [
            ("customer", "c_custkey"), ("supplier", "s_suppkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
            ("events", "event_id"), ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        ]
    }

    for t in ("region", "nation"):  # fixed dims
        pq.write_table(src[t], os.path.join(args.out, f"{t}.parquet"))

    emb_vals = np.concatenate(
        [np.asarray(c, dtype=np.float64) for c in
         src["embeddings"].column("embedding").to_pylist()[:200]]
    )
    emb_sigma = 0.05 * float(np.std(emb_vals))

    plans = {
        # table -> [(column, ceiling-table)] key offsets per replica
        "customer": [("c_custkey", "customer")],
        "supplier": [("s_suppkey", "supplier")],
        "part": [("p_partkey", "part")],
        "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
        "lineitem": [
            ("l_orderkey", "orders"), ("l_partkey", "part"),
            ("l_suppkey", "supplier"),
        ],
        "events": [("event_id", "events"), ("user_id", "customer")],
    }
    for t, cols in plans.items():
        reps = []
        for r in range(args.factor):
            tbl = src[t]
            for col, ct in cols:
                tbl = _offset_col(tbl, col, r * ceil[ct])
            reps.append(tbl)
        pq.write_table(
            pa.concat_tables(reps), os.path.join(args.out, f"{t}.parquet")
        )
        print(f"{t}: {sum(x.num_rows for x in reps)} rows")

    docs = src["documents"]
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    sources = docs.column("source").to_pylist()
    reps = [docs]
    for r in range(1, args.factor):
        tbl = _offset_col(docs, "doc_id", r * ceil["documents"])
        ti = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(
            ti, "text", pa.array(_shuffle_text(texts, doc_ids, r), pa.string())
        )
        # suffix the page key per replica so the snapshots family
        # (source -> page_id for rev_diff/rev_concat/rev_length) scales
        # KEY cardinality with the corpus, not just per-page depth — a
        # constant-cardinality page key would make the sf1 evidence
        # measure history-depth scaling instead of corpus scaling for
        # exactly the skew-sensitive rev family
        si = tbl.schema.get_field_index("source")
        tbl = tbl.set_column(
            si, "source", pa.array([f"{s}~r{r}" for s in sources], pa.string())
        )
        reps.append(tbl)
    pq.write_table(
        pa.concat_tables(reps), os.path.join(args.out, "documents.parquet")
    )
    print(f"documents: {sum(x.num_rows for x in reps)} rows")

    emb = src["embeddings"]
    mat = np.stack(
        [np.asarray(v, dtype=np.float32) for v in emb.column("embedding").to_pylist()]
    )
    reps = [emb]
    for r in range(1, args.factor):
        rng = np.random.RandomState(1000 + r)
        jit = (mat + rng.normal(0.0, emb_sigma, mat.shape)).astype(np.float32)
        tbl = _offset_col(emb, "vec_id", r * ceil["embeddings"])
        ei = tbl.schema.get_field_index("embedding")
        # build with the ORIGINAL list type (field-name-sensitive:
        # concat_tables rejects list<item> next to list<element>)
        col = pa.array(jit.tolist()).cast(emb.schema.field("embedding").type)
        tbl = tbl.set_column(ei, "embedding", col)
        reps.append(tbl)
    pq.write_table(
        pa.concat_tables(reps), os.path.join(args.out, "embeddings.parquet")
    )
    print(f"embeddings: {sum(x.num_rows for x in reps)} rows")


if __name__ == "__main__":
    main()
