"""Deterministic bench-scale input builder: replicate the driver's
sf0.1 tables K× into a new sf-dir so the headline bench can run at
sf≈1 (BASELINE.md: nearly every non-kg headline wall at sf0.1 is
session-fixed-cost, so round-over-round comparisons are
noise-dominated; a 10× input makes the numbers signal).

FACT tables scale K× with shifted keys; DIMENSION tables copy once:

* documents  — doc_id += k·N (synth_vault's link derivation is
  mod-n_docs arithmetic, so any contiguous id range is a valid vault);
  text gets a per-copy prefix so near-dup structure matches the
  original corpus instead of exploding into K-way exact dups.
* events     — event_id += k·N, user_id += k·U (per-user session
  shapes stay identical to sf0.1, the corpus just has K× users).
* embeddings — vec_id += k·N, vectors unchanged.
* orders     — o_orderkey += k·maxOrderkey; o_custkey unchanged.
* lineitem   — l_orderkey += k·maxOrderkey (stays consistent with
  orders); supp/part keys unchanged.
* customer/supplier/part/nation/region — copied as-is (dims).

Pure-pyarrow driver-side job: the sf0.1 inputs total ~17 MB, so this
is a bench-prep utility, not a pipeline (the pipelines themselves
never materialize like this).

    python scripts/make_sfN.py [--src /root/testdata/sf0.1] \
        [--out /tmp/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ["customer", "supplier", "part", "nation", "region"]


def _shift(t: pa.Table, col: str, off: int) -> pa.Table:
    i = t.schema.get_field_index(col)
    return t.set_column(
        i, col, pc.add(t[col], pa.scalar(off, t[col].type))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for d in DIMS:
        pq.write_table(
            pq.read_table(f"{args.src}/{d}.parquet"),
            f"{args.out}/{d}.parquet",
        )

    docs = pq.read_table(f"{args.src}/documents.parquet")
    n_docs = docs.num_rows
    parts = []
    for k in range(args.copies):
        t = _shift(docs, "doc_id", k * n_docs)
        if k:
            i = t.schema.get_field_index("text")
            t = t.set_column(
                i, "text",
                pc.binary_join_element_wise(
                    pa.array([f"c{k}"] * t.num_rows), t["text"], " "
                ),
            )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{args.out}/documents.parquet")

    ev = pq.read_table(f"{args.src}/events.parquet")
    n_ev = ev.num_rows
    n_users = int(pc.max(ev["user_id"]).as_py()) + 1
    pq.write_table(
        pa.concat_tables(
            _shift(_shift(ev, "event_id", k * n_ev),
                   "user_id", k * n_users)
            for k in range(args.copies)
        ),
        f"{args.out}/events.parquet",
    )

    emb = pq.read_table(f"{args.src}/embeddings.parquet")
    n_emb = emb.num_rows
    pq.write_table(
        pa.concat_tables(
            _shift(emb, "vec_id", k * n_emb) for k in range(args.copies)
        ),
        f"{args.out}/embeddings.parquet",
    )

    orders = pq.read_table(f"{args.src}/orders.parquet")
    li = pq.read_table(f"{args.src}/lineitem.parquet")
    okey_span = int(pc.max(orders["o_orderkey"]).as_py()) + 1
    pq.write_table(
        pa.concat_tables(
            _shift(orders, "o_orderkey", k * okey_span)
            for k in range(args.copies)
        ),
        f"{args.out}/orders.parquet",
    )
    pq.write_table(
        pa.concat_tables(
            _shift(li, "l_orderkey", k * okey_span)
            for k in range(args.copies)
        ),
        f"{args.out}/lineitem.parquet",
    )
    print(f"wrote {args.out}: {args.copies}x facts over {args.src}")


if __name__ == "__main__":
    main()
