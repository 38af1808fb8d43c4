"""Event-log analyzer: per-stage core-occupancy timeline.

Reads a Spark event log (zstd or plain), reconstructs task start/end
intervals, and reports: total wall span, integrated core-seconds, average
occupancy vs a given core budget, the biggest idle gaps, and the slowest
stages with their parallelism.

Usage: python tools/analyze_eventlog.py <eventlog-file-or-dir> [core_budget]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def read_lines(path: str):
    if os.path.isdir(path):
        # Spark 4 rolling logs live in an eventlog_v2_<app> subdirectory;
        # recurse until a file whose name starts with "events" is found.
        cands = []
        for root, _dirs, files in os.walk(path):
            cands.extend(os.path.join(root, f) for f in files
                         if f.startswith("events"))
        path = sorted(cands)[-1]
    if path.endswith(".zstd"):
        out = subprocess.run(["unzstd", "-c", path], capture_output=True, text=True)
        return out.stdout.splitlines()
    with open(path, errors="ignore") as f:
        return f.readlines()


def main() -> None:
    path = sys.argv[1]
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tasks = []  # (start_ms, end_ms, stage)
    stage_names = {}
    jobs = []  # [job_id, submit_ms, end_ms, [stage_ids]]
    for line in read_lines(path):
        try:
            e = json.loads(line)
        except Exception:
            continue
        if not isinstance(e, dict):
            continue
        ev = e.get("Event")
        if ev == "SparkListenerTaskEnd":
            ti = e.get("Task Info") or {}
            tasks.append((ti.get("Launch Time", 0), ti.get("Finish Time", 0), e.get("Stage ID")))
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stage_names[si["Stage ID"]] = si["Number of Tasks"]
        elif ev == "SparkListenerJobStart":
            jobs.append([e.get("Job ID"), e.get("Submission Time", 0), None,
                         [s.get("Stage ID") for s in e.get("Stage Infos", [])]])
        elif ev == "SparkListenerJobEnd":
            jid = e.get("Job ID")
            for j in jobs:
                if j[0] == jid:
                    j[2] = e.get("Completion Time", 0)
    if not tasks:
        print("no tasks found")
        return
    t0 = min(t[0] for t in tasks)
    t1 = max(t[1] for t in tasks)
    span = (t1 - t0) / 1000
    core_s = sum((b - a) for a, b, _ in tasks) / 1000
    print(f"tasks={len(tasks)} span={span:.1f}s core_s={core_s:.1f} "
          f"avg_occupancy={core_s / span:.1f}/{budget} cores "
          f"({100 * core_s / span / budget:.0f}%)")

    # occupancy timeline at 1s resolution
    import math
    n_bins = math.ceil(span) + 1
    occ = [0.0] * n_bins
    for a, b, _ in tasks:
        sa, sb = (a - t0) / 1000, (b - t0) / 1000
        for i in range(int(sa), min(int(sb) + 1, n_bins)):
            occ[i] += max(0.0, min(sb, i + 1) - max(sa, i))
    low = [(i, o) for i, o in enumerate(occ) if o < budget * 0.25]
    print(f"seconds below 25% occupancy: {len(low)} of {n_bins}")

    # slowest stages by integrated core time
    per_stage: dict = {}
    for a, b, sid in tasks:
        s = per_stage.setdefault(sid, [0.0, 0, 0, 0])
        s[0] += (b - a) / 1000
        s[1] += 1
        s[2] = max(s[2], (b - a) / 1000)
    print("top stages by core-time: (stage, core_s, n_tasks, max_task_s)")
    for sid, (cs, n, mx, _) in sorted(per_stage.items(), key=lambda kv: -kv[1][0])[:12]:
        print(f"  stage {sid:4}: {cs:7.1f}cs {n:4d} tasks, max {mx:6.2f}s")

    # per-job occupancy: tasks attributed by stage id, occupancy over the
    # job's own submit->end window — separates the dataflow's occupancy
    # from driver-side gaps BETWEEN jobs (generation, collect, bookkeeping)
    print("per-job occupancy: (job, wall_s, core_s, occupancy)")
    stage_to_job = {}
    for jid, a, b, sids in jobs:
        for sid in sids:
            stage_to_job[sid] = jid
    job_core: dict = {}
    for a, b, sid in tasks:
        jid = stage_to_job.get(sid)
        job_core[jid] = job_core.get(jid, 0.0) + (b - a) / 1000
    for jid, a, b, _sids in jobs:
        if b is None or jid not in job_core:
            continue
        wall = (b - a) / 1000
        cs = job_core[jid]
        if wall <= 0:
            continue
        print(f"  job {jid:3}: {wall:7.2f}s {cs:8.1f}cs "
              f"{100 * cs / wall / budget:5.1f}%")


if __name__ == "__main__":
    main()
