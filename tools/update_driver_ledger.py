"""Regenerate DRIVER_CHECKED.json, the driver-coverage ledger.

The verification driver oracle-checks only the first 50 registry entries
(PRIORITY_WINDOW), so which queries have EVER received a driver row is a
coverage fact worth pinning: round 5's window was byte-identical to
round 4's, silently re-checking the same 50 names while 20 registered
queries had never seen a driver row. This tool scans every
CORRECTNESS_r*.json and records, per query, the rounds it was
driver-green in; tests/test_driver_ledger.py turns the ledger into a
failing test when the rotation policy (queries/__init__.py) is skipped.

Run from the repo root at the START of each round, after the driver has
written CORRECTNESS_r{N}.json for the previous round:

    python tools/update_driver_ledger.py

Ledger schema:
    rounds            — every round number with a CORRECTNESS file
    green             — query -> sorted rounds where the driver row passed
    checked           — query -> sorted rounds where a driver row exists
    registered_asof   — query -> first round the ledger saw it registered
                        (new registry names get the current round; existing
                        entries are never rewritten, so age is monotonic)
    windows           — round -> the PRIORITY_WINDOW snapshot for that round
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "DRIVER_CHECKED.json")


def _row_green(res: dict) -> bool:
    if res.get("err"):
        return False
    if not res.get("rows_match"):
        return False
    # hash/schema are None for rows-only checks; an explicit False fails
    if res.get("schema_match") is False:
        return False
    return res.get("hash_match") is not False


def build() -> dict:
    sys.path.insert(0, REPO)
    from flink_tornadovm_artifact_spark.queries import _ALL, ORACLE, PRIORITY_WINDOW

    prior = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            prior = json.load(f)

    green: dict[str, list[int]] = {}
    checked: dict[str, list[int]] = {}
    rounds: list[int] = []
    # numeric sort: lexicographic glob order breaks at round 10
    # (r1, r10, r2, ...) and would scramble rounds[-2:] in the guards
    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1)),
    )
    for path in paths:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            checked.setdefault(name, []).append(rnd)
            if _row_green(res):
                green.setdefault(name, []).append(rnd)

    current = (max(rounds) + 1) if rounds else 1
    # Prune names no longer in the live registry (a query renamed before
    # ever earning a driver row would otherwise leave a phantom row
    # forever — the round-10 `dedup_bloom_ingest` slip). `green`/`checked`
    # keep historical names because they mirror the CORRECTNESS files;
    # `registered_asof` tracks only live names so the ledger count always
    # equals len(queries()) (pinned by tests/test_driver_ledger.py).
    registered_asof = {
        name: rnd
        for name, rnd in prior.get("registered_asof", {}).items()
        if name in _ALL
    }
    for name in _ALL:
        if name not in registered_asof:
            # first driver row bounds the registration round from above
            first = min(checked.get(name, [current]))
            registered_asof[name] = min(first, current)

    windows = {str(k): v for k, v in prior.get("windows", {}).items()}
    windows[str(current)] = list(PRIORITY_WINDOW)

    return {
        "rounds": rounds,
        "current_round": current,
        "green": {k: sorted(v) for k, v in sorted(green.items())},
        "checked": {k: sorted(v) for k, v in sorted(checked.items())},
        "registered_asof": dict(sorted(registered_asof.items())),
        "windows": windows,
        "oracle_backed": sorted(ORACLE),
    }


if __name__ == "__main__":
    ledger = build()
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=False)
        f.write("\n")
    never = [
        q
        for q in ledger["registered_asof"]
        if q not in ledger["checked"] and q in ledger["oracle_backed"]
    ]
    print(
        f"rounds={ledger['rounds']} current={ledger['current_round']} "
        f"green={len(ledger['green'])} never-checked(oracle-backed)={len(never)}"
    )
    for q in never:
        mark = "IN-WINDOW" if q in ledger["windows"][str(ledger["current_round"])] else "NOT-SCHEDULED"
        print(f"  {q}: {mark}")
