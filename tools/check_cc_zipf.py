#!/usr/bin/env python3
"""Chunked DuckDB oracle for d07/d08 at skewed scale (sf1zipf).

The stock d07/d08 oracle (one recursive-CTE transitive closure over the
naive share-a-shingle pair join) exhausts DuckDB temp disk at sf1zipf:
the hot-shingle candidate join materializes ~442M rows before the
per-pair GROUP BY, and the closure walks a ~1k-member boiler clique.
This tool restates the SAME math with bounded intermediates:

1. pair intersections accumulate over K shingle-hash chunks
   (x % K == k), so each candidate join materializes ~1/K of the rows
   before its GROUP BY — identical totals, bounded temp;
2. connected components run as ITERATIVE min-label propagation in
   DuckDB SQL (labels := min(own, neighbors' labels) per round, to a
   counted fixpoint) instead of one recursive closure CTE — linear
   per-round memory, diameter-bounded rounds (the planted structures
   are cliques/twins: diameter 1).

Usage: python3 tools/check_cc_zipf.py <sfDir> <verifyOutDir> [chunks=32]
where <verifyOutDir> holds Verify's d07_dedup_clusters/ and
d08_canonical_docs/ parquet dumps for the same <sfDir>.

--d14 mode checks d14_incremental_clusters instead: same chunked
machinery over the d14 PLANTED corpus (PressPlant at doc_id % 20 == 4),
components restricted to those containing a batch (doc_id % 8 == 0)
member — the registered oracle's exact semantics, which OOM as one
recursive CTE at sf1.

Dev-only tool (driver-side python); the shipped library never reads it.
"""
import sys
import time

import duckdb

PRESS_PLANT = ("shared press release body reused verbatim by every "
               "mirror site in the batch and the corpus alike for this test")


def frame_key(con, rel_sql):
    """check.py's canonical form: columns sorted by name, rows by value."""
    df = con.sql(rel_sql).df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns))
    return [
        "|".join(repr(v) for v in row)
        for row in df.itertuples(index=False)
    ]


def main():
    args = [a for a in sys.argv[1:] if a != "--d14"]
    d14 = "--d14" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    k_chunks = int(args[2]) if len(args) > 2 else 32
    con = duckdb.connect()
    if d14:
        # The registered d14 fixture: PressPlant replaces text at
        # doc_id % 20 == 4, so planted clusters span the % 8 batch draw.
        con.execute(f"""
          CREATE VIEW documents AS
          SELECT doc_id,
            CASE WHEN doc_id % 20 = 4 THEN '{PRESS_PLANT}' ELSE text END AS text
          FROM '{sf_dir}/documents.parquet'""")
    else:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")

    t0 = time.time()
    # Shingle frontier — verbatim from the registered d07 oracle CTE.
    con.execute(r"""
      CREATE TABLE sh AS
      SELECT DISTINCT doc_id, x FROM (
        SELECT doc_id,
          ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 9))::BIGINT AS x
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents
              WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3) tk,
             unnest(generate_series(1, len(t) - 2)) u(i))""")
    con.execute("CREATE TABLE sz AS SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id")
    print(f"[{time.time()-t0:6.1f}s] shingles: "
          f"{con.sql('SELECT COUNT(*) FROM sh').fetchone()[0]} rows")

    # Pair intersection counts, accumulated chunk by chunk: the naive
    # join's GROUP BY totals are a sum over disjoint x-classes, so
    # accumulating per-chunk partials is exact.
    con.execute("CREATE TABLE inter (doc_a BIGINT, doc_b BIGINT, c BIGINT)")
    for k in range(k_chunks):
        con.execute(f"""
          INSERT INTO inter
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.x = b.x AND a.doc_id < b.doc_id
          WHERE a.x % {k_chunks} = {k}
          GROUP BY 1, 2""")
        print(f"[{time.time()-t0:6.1f}s] chunk {k+1}/{k_chunks}: "
              f"{con.sql('SELECT COUNT(*) FROM inter').fetchone()[0]} partials")
    con.execute("""
      CREATE TABLE edges AS
      SELECT doc_a, doc_b FROM (
        SELECT i.doc_a, i.doc_b,
          CAST(SUM(i.c) AS DOUBLE)
            / (MIN(sa.n) + MIN(sb.n) - SUM(i.c)) AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        GROUP BY i.doc_a, i.doc_b)
      WHERE jaccard >= 0.5""")
    n_edges = con.sql("SELECT COUNT(*) FROM edges").fetchone()[0]
    print(f"[{time.time()-t0:6.1f}s] jaccard>=0.5 edges: {n_edges}")

    # Iterative min-label propagation to a counted fixpoint.
    con.execute("""
      CREATE TABLE dir AS
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION ALL SELECT doc_b, doc_a FROM edges""")
    con.execute("""
      CREATE TABLE lbl AS
      SELECT u, LEAST(u, MIN(v)) AS lbl FROM dir GROUP BY u""")
    rounds = 0
    while True:
        rounds += 1
        con.execute("""
          CREATE TABLE lbl2 AS
          SELECT d.u, LEAST(MIN(l_self.lbl), MIN(l_nb.lbl)) AS lbl
          FROM dir d
          JOIN lbl l_self ON l_self.u = d.u
          JOIN lbl l_nb ON l_nb.u = d.v
          GROUP BY d.u""")
        changed = con.sql("""
          SELECT COUNT(*) FROM lbl2 JOIN lbl USING (u)
          WHERE lbl2.lbl <> lbl.lbl""").fetchone()[0]
        con.execute("DROP TABLE lbl")
        con.execute("ALTER TABLE lbl2 RENAME TO lbl")
        print(f"[{time.time()-t0:6.1f}s] round {rounds}: {changed} labels moved")
        if changed == 0:
            break

    n_pass = 0
    checks = {
        "d14_incremental_clusters": """
          WITH touched AS (
            SELECT DISTINCT lbl FROM lbl WHERE u % 8 = 0)
          SELECT l.u AS doc_id, l.lbl AS cluster_id
          FROM lbl l JOIN touched t ON t.lbl = l.lbl""",
    } if d14 else {
        "d07_dedup_clusters": "SELECT u AS doc_id, lbl AS cluster_id FROM lbl",
        "d08_canonical_docs": """
          WITH scored AS (
            SELECT l.lbl AS cluster_id, d.doc_id,
              CAST(length(d.text) AS INTEGER) AS score,
              COUNT(*) OVER (PARTITION BY l.lbl) AS n_docs,
              ROW_NUMBER() OVER (PARTITION BY l.lbl
                ORDER BY length(d.text) DESC, d.doc_id ASC) AS rk
            FROM lbl l JOIN documents d ON d.doc_id = l.u)
          SELECT cluster_id, doc_id AS keep_id, score, n_docs
          FROM scored WHERE rk = 1""",
    }
    for name, sql in checks.items():
        want = frame_key(con, sql)
        got = frame_key(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if got == want:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows, {rounds} label rounds)")
        else:
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            want_set, got_set = set(want), set(got)
            only_g = [r for r in got if r not in want_set][:3]
            only_w = [r for r in want if r not in got_set][:3]
            for d in only_g:
                print(f"  spark-only: {d[:200]}")
            for d in only_w:
                print(f"  oracle-only: {d[:200]}")
    print(f"== {n_pass} pass, {len(checks) - n_pass} fail "
          f"({time.time()-t0:.0f}s wall) ==")
    sys.exit(0 if n_pass == len(checks) else 1)


if __name__ == "__main__":
    main()
