#!/usr/bin/env python3
"""Assemble a bench/oracle_*.json evidence record from a check.py run.

Usage:
  python3 tools/check.py <sfDir> <outDir> | tee /tmp/check.log
  python3 tools/record_oracle.py /tmp/check.log <sfLabel> <round> \
      "<note>" bench/oracle_<label>.json

Parses the PASS/FAIL lines into the per-query record the judged
evidence files carry, so a refresh is a pipeline, not hand-editing.
The output path is an ARGUMENT, not stdout: the record is written to
a temp file in the same directory and os.replace()d onto the target
only on a green run, so a red run can never truncate or destroy the
previous good evidence file (a `> target` shell redirect truncates
before Python even starts — that usage is exactly what this guards
against).
"""
import datetime
import json
import os
import re
import sys
import tempfile


def main():
    if len(sys.argv) != 6:
        sys.exit("usage: record_oracle.py <check.log> <sfLabel> <round> "
                 "<note> <outPath>")
    log_path, sf_label, rnd, note, out_path = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
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
    out_dir = os.path.dirname(os.path.abspath(out_path)) or "."
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        os.replace(tmp, out_path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    print(f"wrote {out_path}: {n_pass} pass")


if __name__ == "__main__":
    main()
