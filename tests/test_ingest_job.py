"""scripts/ingest_job.py — continuous-ingestion replay smoke test in a
fresh process (the persisted-state family composed in one state dir:
graph base + digest-index dedup + session store + additive sum view,
each replay-verified against a from-scratch recompute)."""

import json
import subprocess
import sys


class TestIngestJobCli:
    def test_two_delta_replay_all_stores_verify(self, tmp_path):
        state = str(tmp_path / "state")
        p = subprocess.run(
            [
                sys.executable, "scripts/ingest_job.py",
                "--sf-dir", "/root/testdata/sf0.001",
                "--state-dir", state,
                "--num-buckets", "8",
                "--num-cpus", "4",
            ],
            capture_output=True, text=True, timeout=560, cwd="/root/repo",
        )
        assert p.returncode == 0, p.stderr[-2000:]
        report = json.loads(
            [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        )
        assert report["all_ok"] is True
        for store in ("graph", "dedup", "sessions", "sum_view"):
            assert report[store]["ok"] is True, (store, report[store])
        assert report["graph"]["triples"] > 0
        assert report["dedup"]["admitted"] > 0
        assert report["sessions"]["sessions"] > 0
        # deltas touch a bounded bucket set, not the whole store
        assert report["sessions"]["buckets_touched"] > 0
        assert report["sum_view"]["keys"] > 0
