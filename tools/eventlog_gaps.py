#!/usr/bin/env python
"""Attribute wall-clock inside a Spark event log (guide §7: empirical
measurement when the live UI is off).

For each job: submission/completion time, the thread-local job
description (opt_measure labels its queries), executor task time, and —
the key diagnostic for the round-13 `dft_events` bimodality hunt — the
DRIVER GAP preceding each job (time since the previous job completed,
i.e. planning/collect/broadcast/GC time the stage metrics never see).

Usage:
  python tools/eventlog_gaps.py /tmp/eventlogs/<app-id> [--min-gap 0.2]
"""

from __future__ import annotations

import argparse
import io
import json
import subprocess


def _open_log(path: str):
    if path.endswith(".zstd") or path.endswith(".zst"):
        p = subprocess.Popen(["zstd", "-dc", path], stdout=subprocess.PIPE)
        return io.TextIOWrapper(p.stdout)
    return open(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="+")
    ap.add_argument("--min-gap", type=float, default=0.2)
    ap.add_argument("--min-dur", type=float, default=0.0)
    args = ap.parse_args()

    jobs: dict[int, dict] = {}
    stage_dur: dict[int, float] = {}
    stage_job: dict[int, int] = {}
    lines = (line for path in args.log for line in _open_log(path))
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": props.get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
                for s in ev.get("Stage Infos", []):
                    stage_job[s["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub and com:
                    stage_dur[si["Stage ID"]] = (com - sub) / 1000.0

    order = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    prev_end = None
    t0 = order[0][1]["start"] if order else 0.0
    for jid, j in order:
        end = j.get("end", j["start"])
        dur = end - j["start"]
        gap = (j["start"] - prev_end) if prev_end is not None else 0.0
        prev_end = max(prev_end or end, end)
        sdur = sum(stage_dur.get(s, 0.0) for s in j["stages"])
        if gap >= args.min_gap or dur >= max(args.min_dur, 0.75):
            print(
                f"t={j['start'] - t0:8.2f}s job={jid:<5d} gap_before="
                f"{gap:6.2f}s dur={dur:6.2f}s stage_time={sdur:6.2f}s "
                f"desc={j['desc'][:80]}"
            )


if __name__ == "__main__":
    main()
