#!/usr/bin/env python3
"""Round-start tripwire (round-5 postmortem automation).

Round 5 silently lost 28 events-reader queries when the driver
regenerated the testdata mid-round: the correctness dump shrank and
the smaller report looked like a clean pass. This tool makes that
failure mode loud at the START of a round:

  1. Diffs the key set of the latest CORRECTNESS_r{N}.json against the
     previous round's — keys that disappeared mean queries dropped out
     of the dump (regeneration, crash, or a renamed entry), keys that
     appeared are the round's additions.
  2. Reports any non-passing entries in the latest file.
  3. If BENCH_r{N}.json tails carry the round-7+ tripwire fields
     (`events_ts`, `tables`), diffs those round-over-round too — an
     encoding flip or a row-count change IS a regeneration.

Exit 1 on lost keys or failing entries; 0 otherwise.

Usage: tools/round_start_check.py [repo_root]
       tools/round_start_check.py prev.json curr.json
"""
import json
import re
import sys
from pathlib import Path


def load(path):
    with open(path) as f:
        return json.load(f)


def bench_tail_fields(path):
    """Best-effort parse of the tripwire fields from a BENCH artifact
    (the driver archives only the LAST 2000 chars of the JSON line, so
    the whole file may not parse — regex the tail fields instead)."""
    text = Path(path).read_text(errors="replace")
    out = {}
    m = re.search(r'"events_ts":"([^"]+)"', text)
    if m:
        out["events_ts"] = m.group(1)
    m = re.search(r'"tables":(\{[^}]*\})', text)
    if m:
        try:
            out["tables"] = json.loads(m.group(1))
        except json.JSONDecodeError:
            pass
    return out


def main():
    args = sys.argv[1:]
    if len(args) == 2 and args[0].endswith(".json"):
        prev_path, curr_path = Path(args[0]), Path(args[1])
        root = prev_path.parent
    else:
        root = Path(args[0]) if args else Path(".")
        rounds = sorted(
            (int(m.group(1)), p)
            for p in root.glob("CORRECTNESS_r*.json")
            for m in [re.match(r"CORRECTNESS_r(\d+)\.json", p.name)]
            if m
        )
        if len(rounds) < 2:
            print(f"[round-start] need >=2 CORRECTNESS_r*.json under {root}, "
                  f"found {len(rounds)} — nothing to diff")
            return 0
        (_, prev_path), (_, curr_path) = rounds[-2], rounds[-1]

    prev, curr = load(prev_path), load(curr_path)
    lost = sorted(set(prev) - set(curr))
    gained = sorted(set(curr) - set(prev))
    failing = sorted(
        k for k, v in curr.items()
        if not (v.get("rows_match") and v.get("schema_match")
                and v.get("hash_match"))
    )

    print(f"[round-start] {prev_path.name}: {len(prev)} keys  ->  "
          f"{curr_path.name}: {len(curr)} keys")
    if gained:
        print(f"[round-start] gained ({len(gained)}): {', '.join(gained)}")
    if lost:
        print(f"[round-start] LOST ({len(lost)}): {', '.join(lost)}")
        print("[round-start] lost keys mean queries dropped out of the dump "
              "— check for a testdata regeneration (events.ts encoding, row "
              "counts) before trusting anything else this round")
    if failing:
        print(f"[round-start] FAILING in {curr_path.name} ({len(failing)}): "
              f"{', '.join(failing)}")

    # bench-tail tripwire fields, if both rounds carry them
    benches = {
        int(m.group(1)): p
        for p in root.glob("BENCH_r*.json")
        for m in [re.match(r"BENCH_r(\d+)\.json", p.name)]
        if m
    }
    if len(benches) >= 2:
        ns = sorted(benches)
        a, b = bench_tail_fields(benches[ns[-2]]), bench_tail_fields(benches[ns[-1]])
        if a.get("events_ts") and b.get("events_ts") and a["events_ts"] != b["events_ts"]:
            print(f"[round-start] EVENTS ENCODING FLIPPED: "
                  f"r{ns[-2]}={a['events_ts']} -> r{ns[-1]}={b['events_ts']} "
                  f"— the testdata was regenerated")
        if a.get("tables") and b.get("tables") and a["tables"] != b["tables"]:
            diffs = {
                t: (a["tables"].get(t), b["tables"].get(t))
                for t in set(a["tables"]) | set(b["tables"])
                if a["tables"].get(t) != b["tables"].get(t)
            }
            print(f"[round-start] TABLE ROW COUNTS CHANGED: {diffs} "
                  f"— the testdata was regenerated")

    if lost or failing:
        return 1
    print("[round-start] ok: no lost keys, no failing entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
