"""Continuous-ingestion replay job — proves the persisted-state
family's at-least-once contracts COMPOSE in one state directory
(`ray job submit` compatible; the stateful twin of scripts/prep_job.py
and scripts/kg_job.py).

    python scripts/ingest_job.py --state-dir /data/state \
        [--sf-dir /root/testdata/sf0.001] [--num-buckets 16]

Four persisted stores, one shared ``--state-dir``, replayed over
deltas and then each verified against a from-scratch recompute of the
same final input (the replay oracle):

1. **graph base** (`pipelines/incremental.py`): checkpoint the vault,
   apply a delta (changed doc + alias-stealing new doc + removed doc),
   require the bucket-rewriting incremental triples == full rebuild of
   the mutated vault.
2. **digest-index dedup** (`stages/dedup.py dedup_against_index`):
   ingest even-id docs into a persisted digest index, then dedup the
   odd-id batch against it; admitted set must equal the one-shot
   first-occurrence winners of the same two-batch order.
3. **session store** (`stages/events.py sessionize_update`): absorb
   three OUT-OF-ORDER event deltas (late arrivals merge sessions);
   `read_sessions` must equal the one-shot `sessionize` of all events.
4. **additive sum view** (`state/ incremental_sum_view`): two delta
   batches with overlapping keys; `read_sum_view` must equal the
   one-shot groupby-sum.

Prints ONE JSON line: per-store ok + row counts + buckets touched +
wall seconds, ``all_ok`` overall.  Verification collects sorted row
tuples on the driver — bounded at the smoke scales this job runs at
(the stores themselves are bucket-partitioned and delta-proportional;
only the CHECK is driver-side).  Owns its Ray session standalone;
attaches to a cluster under ``ray job submit`` (honors RAY_ADDRESS).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _rows(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--state-dir", default="/tmp/graft_ingest_state")
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--keep-state", action="store_true",
                    help="leave the state dir in place for inspection")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="cap the local Ray session (smoke tests)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(
            address=os.environ.get("RAY_ADDRESS") or "local",
            include_dashboard=False,
            logging_level="ERROR",
            **kw,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from obsidian_parser_ray import build_graph, synth_vault
    from obsidian_parser_ray.pipelines.incremental import (
        checkpoint_graph_base,
        incremental_update,
    )
    from obsidian_parser_ray.sources import from_markdown_items
    from obsidian_parser_ray.stages.dedup import dedup_against_index
    from obsidian_parser_ray.stages.events import (
        read_sessions,
        sessionize,
        sessionize_update,
    )
    from obsidian_parser_ray.state import incremental_sum_view, read_sum_view

    state = args.state_dir
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    report: dict = {"metric": "ingest_replay", "sf": args.sf_dir,
                    "state_dir": state}
    t0 = time.perf_counter()

    # ---- 1. graph base: checkpoint + delta vs full rebuild ----------
    delta_items = [
        ("note_7", "Rewired to [[note_3]] only now. #tag_d"),
        ("aaa/thief", "---\naliases: [alias_0]\n---\nSteals alias_0."),
    ]
    removed = ["note_11"]
    v0 = synth_vault(args.sf_dir)
    graph_dir = os.path.join(state, "graph")
    checkpoint_graph_base(v0, graph_dir, num_buckets=args.num_buckets)
    inc = incremental_update(graph_dir, from_markdown_items(delta_items),
                             removed)
    got = _rows(inc, ["subj", "pred", "obj", "weight"])
    changed = {d for d, _ in delta_items} | set(removed)

    def drop_changed(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(
            t["doc_id"], value_set=pa.array(sorted(changed), pa.string())
        )))

    full = build_graph(
        v0.map_batches(drop_changed, batch_format="pyarrow").union(
            from_markdown_items(delta_items)),
        materialize_notes=True,
    )
    exp = _rows(full.triples, ["subj", "pred", "obj", "weight"])
    report["graph"] = {"ok": got == exp, "triples": len(got)}

    # ---- 2. digest-index dedup: two batches vs one-shot winners -----
    docs = rd.read_parquet(f"{args.sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np

            keys = t["doc_id"]
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            return t.filter(pa.array(
                keys.to_numpy(zero_copy_only=False) % 2 == parity))

        return f

    idx_dir = os.path.join(state, "digest_index")
    adm0 = dedup_against_index(
        docs.map_batches(half(0), batch_format="pyarrow"), idx_dir,
        num_partitions=8).materialize()
    adm1 = dedup_against_index(
        docs.map_batches(half(1), batch_format="pyarrow"), idx_dir,
        num_partitions=8).materialize()
    got_ids = sorted(r["doc_id"] for r in
                     adm0.union(adm1).select_columns(["doc_id"]).take_all())
    # oracle: replay the same two-batch order driver-side (bounded)
    rows = sorted(
        (int(r["doc_id"]) % 2, int(r["doc_id"]), r["text"])
        for r in docs.take_all()
    )
    seen: set = set()
    exp_ids = []
    for _, did, text in rows:
        if text not in seen:
            seen.add(text)
            exp_ids.append(did)
    report["dedup"] = {"ok": got_ids == sorted(exp_ids),
                       "admitted": len(got_ids)}

    # ---- 3. session store: out-of-order deltas vs one-shot ----------
    ev = rd.read_parquet(f"{args.sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    sess_dir = os.path.join(state, "sessions_store")
    os.makedirs(sess_dir, exist_ok=True)
    touched = 0
    for r in (0, 2, 1):  # middle slice arrives LAST: late events merge
        def pick(t: pa.Table, r=r) -> pa.Table:
            m = pc.equal(
                pc.subtract(
                    t["event_id"],
                    pc.multiply(pc.divide(t["event_id"], 3),
                                pa.scalar(3, pa.int64()))),
                pa.scalar(r, pa.int64()))
            return t.filter(m).select(["user_id", "ts"])

        touched += sessionize_update(
            sess_dir, ev.map_batches(pick, batch_format="pyarrow"),
        )["buckets_touched"]
    sess_cols = ["user_id", "session_idx", "n_events", "start_s", "end_s"]
    got_s = _rows(read_sessions(sess_dir), sess_cols)
    exp_s = _rows(sessionize(ev.select_columns(["user_id", "ts"])),
                  sess_cols)
    report["sessions"] = {"ok": got_s == exp_s, "sessions": len(got_s),
                          "buckets_touched": touched}

    # ---- 4. additive sum view: overlapping deltas vs one-shot -------
    evv = rd.read_parquet(f"{args.sf_dir}/events.parquet",
                          columns=["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "cents": pc.cast(pc.floor(pc.multiply(
                t["value"], pa.scalar(100.0))), pa.int64()),
        })

    evc = evv.map_batches(cents, batch_format="pyarrow")
    view_dir = os.path.join(state, "sum_view")
    os.makedirs(view_dir, exist_ok=True)
    vtouched = 0
    for parity in (0, 1):  # every event_type key appears in BOTH deltas
        def pick(t: pa.Table, p=parity) -> pa.Table:
            import numpy as np

            ids = t["event_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return t.filter(pa.array(
                ids.to_numpy(zero_copy_only=False) % 2 == p)).select(
                ["event_type", "cents"])

        vtouched += incremental_sum_view(
            view_dir, evc.map_batches(pick, batch_format="pyarrow"),
            keys=["event_type"], sums=["cents"],
        )["buckets_touched"]
    got_v = _rows(read_sum_view(view_dir), ["event_type", "cents"])
    from ray.data.aggregate import Sum

    exp_v = _rows(
        evc.groupby("event_type").aggregate(Sum("cents", alias_name="cents")),
        ["event_type", "cents"])
    report["sum_view"] = {"ok": got_v == exp_v, "keys": len(got_v),
                          "buckets_touched": vtouched}

    report["all_ok"] = all(report[k]["ok"]
                           for k in ("graph", "dedup", "sessions",
                                     "sum_view"))
    report["sec"] = round(time.perf_counter() - t0, 2)
    if not args.keep_state:
        shutil.rmtree(state, ignore_errors=True)
    print(json.dumps(report))
    ray.shutdown()
    sys.exit(0 if report["all_ok"] else 1)


if __name__ == "__main__":
    main()
