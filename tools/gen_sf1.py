#!/usr/bin/env python3
"""Deterministic sf1 slice for the scale soak (dev tool, driver-side
python only — the engine never reads this code).

Grows the two LLM-pipeline tables 10x over sf0.1 while preserving the
statistics the dedup/ANN operators key on:

- documents (5,000 -> 50,000): ten copies of the sf0.1 corpus. Copy 0
  is verbatim; copies 1-9 replace every token at position i with
  i % 3 == c % 3 by a hash-picked word from the same vocabulary. Every
  word-3-gram window contains exactly one replaced position, so ALL
  shingles change and cross-copy Jaccard collapses to ~0, while
  replacements depend only on (copy, position, original word) so the
  ~25 within-copy near-dup pairs survive in each copy: d02/d03 output
  grows ~10x (linearly), matching corpus growth -- the property the
  soak measures. Exact-dup structure (8 dup texts/copy) also scales.

- embeddings (2,000 -> 20,000): fresh seeded unit-normalized 64-d
  gaussian vectors, labels uniform over 10 cells -- same distribution
  as the driver corpus (element std 1/8 = unit norm at d=64).

Usage: python3 tools/gen_sf1.py [outdir]   (default scaledata/sf1)
Other tables are symlinked from sf0.1 so graft.Bench runs unmodified.
"""
import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main(outdir):
    os.makedirs(outdir, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
    n = len(docs["doc_id"])
    vocab = sorted({w for t in docs["text"] for w in t.split()})
    V = len(vocab)

    out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for c in range(COPIES):
        for j in range(n):
            toks = docs["text"][j].split()
            if c > 0:
                toks = [
                    vocab[int.from_bytes(
                        hashlib.md5(f"{c}|{i}|{w}".encode()).digest()[:4],
                        "big") % V]
                    if i % 3 == c % 3 else w
                    for i, w in enumerate(toks)
                ]
            text = " ".join(toks)
            out["doc_id"].append(c * 100000 + docs["doc_id"][j])
            out["text"].append(text)
            out["lang"].append(docs["lang"][j])
            out["source"].append(docs["source"][j])
            out["n_chars"].append(len(text))
    pq.write_table(pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    }), f"{outdir}/documents.parquet")

    rng = np.random.default_rng(42)
    m = 20000
    vecs = rng.standard_normal((m, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(m), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(m) % 10).astype(np.int32), pa.int32()),
    }), f"{outdir}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = f"{outdir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"wrote {outdir}: documents={COPIES * n} embeddings={m}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf1")
