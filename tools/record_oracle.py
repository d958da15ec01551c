#!/usr/bin/env python3
"""Assemble a bench/oracle_*.json evidence record from a check.py run.

Usage:
  python3 tools/check.py <sfDir> <outDir> | tee /tmp/check.log
  python3 tools/record_oracle.py /tmp/check.log <sfLabel> <round> \
      "<note>" > bench/oracle_<label>.json

Parses the PASS/FAIL lines into the per-query record the judged
evidence files carry, so a refresh is a pipeline, not hand-editing.
Exits non-zero if any FAIL/ERROR line is present — a record of a red
run should never be written silently.
"""
import datetime
import json
import re
import sys


def main():
    log_path, sf_label, rnd, note = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    queries = {}
    n_pass = n_fail = 0
    for line in open(log_path):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            queries[m.group(1)] = {"pass": True, "rows": int(m.group(2))}
            n_pass += 1
            continue
        m = re.match(r"(FAIL|ERROR) (\S+?):? ", line)
        if m:
            queries[m.group(2)] = {"pass": False}
            n_fail += 1
    if not queries:
        sys.exit("no PASS/FAIL lines found in " + log_path)
    # Refuse BEFORE emitting anything: the documented usage redirects
    # stdout into bench/oracle_<label>.json, so writing the record and
    # THEN exiting 1 would still truncate the previous good evidence
    # file with a red run's record.
    if n_fail:
        sys.exit(f"{n_fail} FAIL/ERROR lines in {log_path} - refusing to "
                 "emit an evidence record for a red run")
    record = {
        "sf": sf_label,
        "date": datetime.date.today().isoformat(),
        "round": rnd,
        "tool": "tools/check.py (local mirror of the driver DuckDB gate), one full run",
        # Scope (full surface vs a named subset) belongs in the note —
        # a canned "full surface" claim was wrong for subset records
        # like the sf1zipf skew set.
        "summary": f"{n_pass} pass, {n_fail} fail",
        "note": note,
        "queries": dict(sorted(queries.items())),
    }
    json.dump(record, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
