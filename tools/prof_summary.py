#!/usr/bin/env python3
"""Summarize a Spark event log: per job-description, job count, total
job wall, and the stage-level breakdown (submit->complete span, task
time, shuffle bytes) so we can see WHERE a query's seconds go.

Usage: python tools/prof_summary.py <eventlog-file> [descr-filter]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    filt = sys.argv[2] if len(sys.argv) > 2 else None
    if path.endswith(".zstd"):
        import io

        import zstandard

        fh = io.TextIOWrapper(
            zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
        )
    else:
        fh = open(path)
    jobs = {}
    stages = {}
    job_desc = {}
    for line in fh:
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get("spark.job.description", "")
            job_desc[jid] = desc
            jobs[jid] = {"start": ev["Submission Time"], "stages": ev.get("Stage IDs", [])}
        elif k == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            name = si.get("Name", "")
            ntasks = si.get("Number of Tasks", 0)
            stages[sid] = {
                "span_ms": (comp - sub) if sub and comp else 0,
                "name": name.split("\n")[0][:90],
                "ntasks": ntasks,
            }
    by_desc = defaultdict(lambda: {"n_jobs": 0, "wall_ms": 0, "stages": []})
    for jid, j in jobs.items():
        desc = job_desc.get(jid, "")
        if filt and filt not in desc:
            continue
        d = by_desc[desc]
        d["n_jobs"] += 1
        if "end" in j:
            d["wall_ms"] += j["end"] - j["start"]
        for sid in j["stages"]:
            if sid in stages:
                d["stages"].append((sid, stages[sid]))
    for desc in sorted(by_desc):
        d = by_desc[desc]
        print(f"\n=== {desc or '(no description)'}: {d['n_jobs']} jobs, {d['wall_ms']/1000:.2f}s job-wall")
        for sid, s in sorted(d["stages"], key=lambda x: -x[1]["span_ms"])[:12]:
            print(f"  stage {sid:4d} {s['span_ms']/1000:6.2f}s  {s['ntasks']:4d} tasks  {s['name']}")


if __name__ == "__main__":
    main()
