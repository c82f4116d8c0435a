"""Training-data preparation job entry point (`ray job submit`
compatible) — the document-pipeline twin of `scripts/kg_job.py`.

    ray job submit --working-dir . -- \
        python scripts/prep_job.py --input docs.parquet --output /out/corpus \
        [--digest-index /idx] [--strip-ngram 20] [--min-quality 650000] \
        [--langs en,de] [--capacity 2048] [--num-shards 64]

Stages (each individually oracle-checked by the driver contract; every
stage streams — the only barriers are the dedup shuffles and the final
shard export):

    read → normalize → [strip repeated n-grams] → quality+lang filter
    → exact dedup (batch-local, or INCREMENTAL against --digest-index)
    → chunk → pack into fixed-token sequences → sharded parquet export

Prints a one-line JSON job report (per-stage row counts, wall time,
export manifest).  Owns its Ray session standalone; attaches to the
cluster under `ray job submit` (honors RAY_ADDRESS).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet path (doc_id, text[, lang])")
    ap.add_argument("--output", required=True, help="shard output directory")
    ap.add_argument("--digest-index", default=None,
                    help="persisted digest index dir: dedup INCREMENTALLY "
                         "against all prior runs (shared storage)")
    ap.add_argument("--strip-ngram", type=int, default=None,
                    help="excise word spans inside n-grams shared by 2+ "
                         "docs before quality scoring")
    ap.add_argument("--min-quality", type=int, default=0,
                    help="integer micro quality floor (0 = keep all)")
    ap.add_argument("--langs", default=None,
                    help="comma-separated lang codes to keep")
    ap.add_argument("--capacity", type=int, default=None,
                    help="pack chunks into sequences of this many tokens")
    ap.add_argument("--window", type=int, default=200)
    ap.add_argument("--overlap", type=int, default=50)
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dataset-id", default="")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS")
        ray.init(
            address=addr or "local",
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import ray.data as rd

    from obsidian_parser_ray.stages.chunking import (
        chunk_documents,
        export_training_shards,
        pack_sequences,
    )
    from obsidian_parser_ray.stages.dedup import (
        dedup_against_index,
        drop_exact_duplicates,
        remove_repeated_ngrams,
    )
    from obsidian_parser_ray.stages.text import normalize_text

    t0 = time.perf_counter()
    report: dict = {"input": args.input, "output": args.output, "stages": {}}

    docs = rd.read_parquet(args.input)
    has_lang = "lang" in (docs.schema().names or [])
    report["stages"]["read"] = docs.count()

    normed = normalize_text(docs, out_col="text")
    if has_lang and args.langs:
        from obsidian_parser_ray.stages.joins import hash_join_unique

        normed = hash_join_unique(
            normed, docs.select_columns(["doc_id", "lang"]),
            left_key="doc_id", num_partitions=args.num_partitions,
        )

    if args.strip_ngram:
        stripped = remove_repeated_ngrams(
            normed, n=args.strip_ngram, min_docs=2,
            num_partitions=args.num_partitions,
        )

        def as_text(t: pa.Table) -> pa.Table:
            cols = {"doc_id": t["doc_id"], "text": t["clean_text"]}
            return pa.table(cols)

        cleaned = stripped.map_batches(as_text, batch_format="pyarrow")
        if has_lang and args.langs:
            from obsidian_parser_ray.stages.joins import hash_join_unique

            cleaned = hash_join_unique(
                cleaned, docs.select_columns(["doc_id", "lang"]),
                left_key="doc_id", num_partitions=args.num_partitions,
            )
        normed = cleaned

    if args.min_quality or args.langs:
        import pyarrow.compute as pc

        from obsidian_parser_ray.stages.text import quality_score_batch

        scored = normed.map_batches(
            quality_score_batch, batch_format="pyarrow", batch_size=512
        )
        langs = tuple(args.langs.split(",")) if args.langs else None

        def keep(t: pa.Table) -> pa.Table:
            mask = pc.greater_equal(
                t["quality_micro"], pa.scalar(args.min_quality, pa.int64())
            )
            if langs is not None and "lang" in t.column_names:
                mask = pc.and_(
                    mask,
                    pc.is_in(t["lang"],
                             value_set=pa.array(list(langs), pa.string())),
                )
            return t.filter(mask).select(["doc_id", "text"])

        normed = scored.map_batches(keep, batch_format="pyarrow")

    if args.digest_index:
        kept = dedup_against_index(
            normed, args.digest_index,
            num_partitions=args.num_partitions,
        )
    else:
        kept = drop_exact_duplicates(
            normed, num_partitions=args.num_partitions
        )
    kept = kept.materialize()  # consumed by count + downstream
    report["stages"]["after_dedup"] = kept.count()
    if report["stages"]["after_dedup"] == 0:
        # nothing new admitted (e.g. an incremental rerun of an
        # already-ingested batch): report and exit without an export
        report["stages"]["shards"] = 0
        report["rows_exported"] = 0
        report["sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(report))
        ray.shutdown()
        return

    chunks = chunk_documents(
        kept.select_columns(["doc_id", "text"]),
        window=args.window, overlap=args.overlap,
    )
    if args.capacity:
        chunks = pack_sequences(
            chunks, capacity=args.capacity,
            num_partitions=args.num_partitions,
        )
    manifest = export_training_shards(
        chunks, args.output, num_shards=args.num_shards, seed=args.seed,
        dataset_id=args.dataset_id,
    )
    report["stages"]["shards"] = len(manifest.get("partitions", {}))
    report["rows_exported"] = sum(
        p["rows"] for p in manifest.get("partitions", {}).values()
    ) if isinstance(manifest.get("partitions"), dict) else None
    report["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
