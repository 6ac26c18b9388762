"""Scaling-gate evidence runner (BASELINE.md protocol; north_rule's N->4N
criterion evidenced in-sandbox as executor counts on one host).

Runs the full pipeline at local-cluster[N,2,12288] for N in {1,2,4,8}
executors — real separate executor JVMs, fixed 2-core/12g shape, only the
COUNT varies (the rule's "N and 4N executors") — in fresh JVM trees,
``repeats`` times each, interleaved round-robin (so drift in machine state
spreads across widths instead of biasing one), and prints per-width medians
plus eff(N->4N) median and max-min spread for the 1->4 (primary gate) and
2->8 (secondary, host-ceiling-limited) pairs.

Usage: python bench/scaling_protocol.py [repeats=3] [scale=scaling]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CHILD = """
import json, sys, time
sys.path.insert(0, "/root/repo")
master, fixture_dir = sys.argv[1], sys.argv[2]
from kgx.session import get_spark
from kgx.pipeline import PipelineConfig, run_pipeline
spark = get_spark("kgx-scaling", master=master, shuffle_partitions=32)
cfg = PipelineConfig(
    source_uri=f"{fixture_dir}/source_files.parquet",
    dict_uri=f"{fixture_dir}/compound_dict.parquet",
    num_partitions=64,
)
t0 = time.monotonic()
out = run_pipeline(spark, cfg)
n = out["triples"].count()
print(json.dumps({"wall_sec": round(time.monotonic() - t0, 2), "triples": n}))
"""

WIDTHS = (
    "local-cluster[1,2,12288]",
    "local-cluster[2,2,12288]",
    "local-cluster[4,2,12288]",
    "local-cluster[8,2,12288]",
)


def run_once(master: str, fixture_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, master, fixture_dir],
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scale = sys.argv[2] if len(sys.argv) > 2 else "scaling"
    from kgx.fixtures.gen import ensure

    fixture_dir = str(ensure(scale, "/root/repo/tests/fixtures"))

    walls: dict[str, list[float]] = {w: [] for w in WIDTHS}
    for rep in range(repeats):
        for w in WIDTHS:
            t0 = time.monotonic()
            r = run_once(w, fixture_dir)
            walls[w].append(r["wall_sec"])
            print(
                f"rep {rep + 1}/{repeats} {w:10s} wall={r['wall_sec']:8.2f}s "
                f"triples={r['triples']} (run took {time.monotonic() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )

    med = {w: statistics.median(v) for w, v in walls.items()}
    effs_14 = sorted(
        a / b / 4
        for a, b in zip(walls["local-cluster[1,2,12288]"], walls["local-cluster[4,2,12288]"])
    )
    effs_28 = sorted(
        a / b / 4
        for a, b in zip(walls["local-cluster[2,2,12288]"], walls["local-cluster[8,2,12288]"])
    )
    report = {
        "scale": scale,
        "repeats": repeats,
        "wall_sec": walls,
        "median_wall_sec": med,
        "eff_exec_1_to_4": {
            "per_rep": [round(e, 3) for e in effs_14],
            "median": round(statistics.median(effs_14), 3),
            "spread": round(effs_14[-1] - effs_14[0], 3),
        },
        "eff_exec_2_to_8": {
            "per_rep": [round(e, 3) for e in effs_28],
            "median": round(statistics.median(effs_28), 3),
            "spread": round(effs_28[-1] - effs_28[0], 3),
        },
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
