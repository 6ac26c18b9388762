"""Group event-log task-seconds by job description (pipeline phase).

Usage: python bench/evlog_jobs.py /path/to/eventlog_v2_<appid>

The per-phase core-second tables in BASELINE.md (round-5 fusion and
single-pass-routing A/Bs) come from this: job walls are unreadable under
this host's drift, but summed task durations grouped by the pipeline's
setJobDescription labels are stable run-to-run (see bench/evlog.py for
the finer-grained per-stage/gap analysis).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pathlib import Path
from evlog import _iter_events

app = Path(sys.argv[1])
job_desc = {}          # job id -> description
stage_job = {}         # stage id -> job id
task_ms = {}           # stage id -> task ms
for ev in _iter_events(app):
    e = ev.get("Event", "")
    if e == "SparkListenerJobStart":
        jid = ev["Job ID"]
        props = ev.get("Properties") or {}
        job_desc[jid] = props.get("spark.job.description") or props.get("callSite.short", "?")
        for sid in ev.get("Stage IDs", []):
            stage_job[sid] = jid
    elif e == "SparkListenerTaskEnd":
        sid = ev["Stage ID"]
        info = ev.get("Task Info", {})
        dur = (info.get("Finish Time", 0) or 0) - (info.get("Launch Time", 0) or 0)
        task_ms[sid] = task_ms.get(sid, 0.0) + max(dur, 0)

by_desc = {}
for sid, ms in task_ms.items():
    d = job_desc.get(stage_job.get(sid, -1), "?")
    by_desc[d] = by_desc.get(d, 0.0) + ms
total = sum(by_desc.values()) / 1000
for d, ms in sorted(by_desc.items(), key=lambda kv: -kv[1]):
    print(f"{ms/1000:9.1f} core-s  {ms/10/total:5.1f}%  {d[:80]}")
print(f"{total:9.1f} core-s  total")
