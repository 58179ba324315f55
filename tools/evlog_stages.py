#!/usr/bin/env python3
"""Summarise a Spark event log: per-stage wall, task-time sum, and the
dominant RDD/exchange name — attribution aid for scaling work.
Usage: python3 tools/evlog_stages.py <event-log-file> [minSec]
"""
import json, sys

path = sys.argv[1]
min_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
stages = {}
for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    t = e.get("Event")
    if t == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        wall = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
        stages[sid] = {
            "name": si.get("Stage Name", "")[:80],
            "wall": wall,
            "tasks": si.get("Number of Tasks", 0),
            "details": si.get("Details", "").split("\n")[0][:100],
        }
rows = sorted(stages.items(), key=lambda kv: -kv[1]["wall"])
tot = sum(v["wall"] for _, v in stages.items())
print(f"{len(stages)} stages, sum of stage walls {tot:.1f}s (overlap possible)")
for sid, v in rows:
    if v["wall"] < min_sec:
        continue
    print(f"stage {sid:4d}  {v['wall']:7.2f}s  {v['tasks']:5d} tasks  {v['name']}")
