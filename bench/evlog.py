"""Event-log analyzer for the scaling gate: where does the non-scaling time
go at width N?

Reads a Spark event-log directory (spark.eventLog.dir) and prints, per
application: total wall, sum of task time, per-stage (wall, task-sec,
tasks, tail = stage wall − task-sec/width), and the DRIVER GAPS — spans
where no stage is running (planning, Python driver work, checkpoint
bookkeeping).  The serial floor S in T = C/width + S is ~(gaps + tails),
so this is the itemized bill for the ≥0.8 efficiency target.

Usage: python bench/evlog.py <eventlog_dir> [width_cores]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def _iter_events(app_dir: Path):
    # spark writes eventlog_v2_<app>/events_1_... (zstd) or a single file
    files = sorted(app_dir.glob("events_*")) if app_dir.is_dir() else [app_dir]
    for f in files:
        if f.name.endswith(".zstd"):
            try:
                import zstandard

                with open(f, "rb") as fh:
                    reader = zstandard.ZstdDecompressor().stream_reader(fh)
                    data = reader.read().decode("utf-8", "replace")
            except ImportError:
                # no python binding in this env — the zstd CLI ships with conda
                import subprocess

                data = subprocess.run(
                    ["zstd", "-dc", str(f)], capture_output=True, check=True
                ).stdout.decode("utf-8", "replace")
        else:
            data = f.read_text(errors="replace")
        for line in data.splitlines():
            if line:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def analyze(app_dir: Path, width: int) -> dict:
    stages: dict[tuple[int, int], dict] = {}
    task_ms: dict[tuple[int, int], float] = {}
    task_n: dict[tuple[int, int], int] = {}
    app_start = app_end = None
    for ev in _iter_events(app_dir):
        e = ev.get("Event", "")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "sub": None,
                "comp": None,
            }
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si["Stage Attempt ID"])
            stages.setdefault(key, {"name": si["Stage Name"].split("\n")[0][:70]})
            stages[key]["sub"] = si.get("Submission Time")
            stages[key]["comp"] = si.get("Completion Time")
        elif e == "SparkListenerTaskEnd":
            si = ev["Stage ID"], ev["Stage Attempt ID"]
            info = ev.get("Task Info", {})
            dur = (info.get("Finish Time", 0) or 0) - (info.get("Launch Time", 0) or 0)
            task_ms[si] = task_ms.get(si, 0.0) + max(dur, 0)
            task_n[si] = task_n.get(si, 0) + 1

    rows = []
    spans = []
    for key, st in stages.items():
        if st.get("sub") is None or st.get("comp") is None:
            continue
        wall = (st["comp"] - st["sub"]) / 1000.0
        tsec = task_ms.get(key, 0.0) / 1000.0
        rows.append(
            {
                "stage": key[0],
                "wall": round(wall, 2),
                "task_sec": round(tsec, 1),
                "tasks": task_n.get(key, 0),
                "tail": round(wall - tsec / width, 2),
                "name": st["name"],
            }
        )
        spans.append((st["sub"], st["comp"]))

    # driver gaps: total app time not covered by any running stage
    spans.sort()
    # truncated logs (killed runs) may lack ApplicationStart/End — fall
    # back to the stage-span envelope so a partial log still analyzes
    # instead of crashing on None arithmetic
    if app_start is None:
        app_start = spans[0][0] if spans else 0
    if app_end is None:
        app_end = max(c for _, c in spans) if spans else app_start
    merged = []
    for s, c in spans:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], c)
        else:
            merged.append([s, c])
    covered = sum(c - s for s, c in merged) / 1000.0
    wall = ((app_end or 0) - (app_start or 0)) / 1000.0
    gaps = []
    prev = app_start
    for s, c in merged:
        if s - prev > 500:
            gaps.append({"at": round((prev - app_start) / 1000.0, 1), "gap": round((s - prev) / 1000.0, 2)})
        prev = max(prev, c)
    if app_end and app_end - prev > 500:
        gaps.append({"at": round((prev - app_start) / 1000.0, 1), "gap": round((app_end - prev) / 1000.0, 2)})

    rows.sort(key=lambda r: -r["tail"])
    return {
        "wall_sec": round(wall, 1),
        "stage_covered_sec": round(covered, 1),
        "driver_gap_sec": round(wall - covered, 1),
        "task_sec_total": round(sum(task_ms.values()) / 1000.0, 1),
        "top_tails": rows[:15],
        "gaps_over_500ms": gaps,
    }


def main():
    base = Path(sys.argv[1])
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    apps = sorted(base.glob("eventlog_v2_*")) or sorted(
        p for p in base.iterdir() if p.is_file()
    )
    for app in apps:
        print(f"== {app.name} (width={width} cores)")
        print(json.dumps(analyze(app, width), indent=2))


if __name__ == "__main__":
    main()
