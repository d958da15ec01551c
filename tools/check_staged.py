#!/usr/bin/env python3
"""Staged executor for oversized oracle CTE chains (dev-only tool).

Usage: python3 tools/check_staged.py <sfDir> <verifyOutDir> <query> [...]

Some composed oracles (t43 at sf1 is the first; d07/d08/d14's
recursive chains have their own chunked checker) blow DuckDB's temp
disk when run as ONE statement: the optimizer inlines shared CTEs and
a spilling plan materializes pair-grain intermediates tens of GB wide.
This runs the SAME oracle SQL — read verbatim from the dump's
oracle_sql.json, never restated — but materializes each top-level CTE
as a TEMP TABLE in declaration order, so every stage gets a small
standalone plan and holds only its OUTPUT rows (a pair stage's output
is post-filter and tiny even when its join frame is huge). Recursive
chains are out of scope (a WITH RECURSIVE head fails loudly).

The comparison (column sort, pandas row sort, full-precision canon)
is check.py's verbatim, so PASS here means exactly what the driver
gate means.
"""
import json
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import TABLES, frame_key  # noqa: E402


def split_ctes(sql):
    """Split 'WITH a AS (...), b AS (...), ... SELECT ...' into
    ([(name, body)...], final_select), respecting quotes/parens.

    Known limits (dev-only tool, fails LOUDLY rather than wrongly):
    no SQL-comment or double-quoted-identifier awareness — the
    engine's generated oracle texts use neither. Malformed or
    unanticipated text raises a clear 'unparseable CTE chain' error
    instead of an IndexError deep in the scan."""
    def bail(why, pos):
        raise ValueError(
            f"unparseable CTE chain: {why} (at offset {pos}): "
            f"...{sql[max(0, pos - 40):pos + 40]!r}...")
    s = sql.strip()
    assert s.upper().startswith("WITH "), "oracle is not a WITH chain"
    assert not s.upper().startswith("WITH RECURSIVE"), \
        "recursive chains need the dedicated chunked checker"
    i = 5  # past 'WITH '
    ctes = []
    n = len(s)
    while True:
        # parse: name AS ( body )
        while i < n and s[i].isspace():
            i += 1
        if i >= n:
            bail("expected a CTE name, hit end of text", i)
        j = i
        while j < n and s[j] not in " \t\n(":
            j += 1
        name = s[i:j]
        k = s.find("(", j)
        if k < 0:
            bail(f"no '(' after CTE name {name!r}", j)
        depth, m = 0, k
        in_str = False
        while m < n:
            c = s[m]
            if in_str:
                if c == "'":
                    # '' escape inside DuckDB strings
                    if m + 1 < n and s[m + 1] == "'":
                        m += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            m += 1
        if m >= n:
            bail(f"unbalanced parens in CTE {name!r} body", k)
        body = s[k + 1:m]
        ctes.append((name, body))
        # after ')': either ',' (next CTE) or the final SELECT
        p = m + 1
        while p < n and s[p].isspace():
            p += 1
        if p >= n:
            bail(f"no final SELECT after CTE {name!r}", p)
        if s[p] == ",":
            i = p + 1
            continue
        return ctes, s[p:]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in names:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        try:
            ctes, final = split_ctes(oracle[name])
            for cte_name, body in ctes:
                con.execute(f"CREATE TEMP TABLE {cte_name} AS {body}")
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(final).df()
            gk, wk = frame_key(got), frame_key(want)
            gcols, wcols = sorted(got.columns), sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} != {wcols}")
                n_fail += 1
            elif gk != wk:
                n_fail += 1
                print(f"FAIL {name}: rows {len(gk)} vs {len(wk)}")
                wk_set, gk_set = set(wk), set(gk)
                for d in [r for r in gk if r not in wk_set][:3]:
                    print(f"  spark-only: {d[:200]}")
                for d in [r for r in wk if r not in gk_set][:3]:
                    print(f"  oracle-only: {d[:200]}")
            else:
                print(f"PASS {name} ({len(gk)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {e}")
        finally:
            con.close()
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


