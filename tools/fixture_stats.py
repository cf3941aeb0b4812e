#!/usr/bin/env python3
"""Print content fingerprints of the driver-owned fixtures.

The driver regenerates /root/testdata in place between rounds; bench
numbers for content-sensitive queries (token volume, dup rates) are
only comparable within one generation. Run this after any regeneration
and record the output in TESTDATA.md so the next cross-round bench
comparison can tell "fixture moved" from "code regressed" without
archaeology (the round-8→9 lesson).
"""
import glob
import os
import sys

import duckdb

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"

for d in sorted(glob.glob(f"{ROOT}/sf*")):
    docs = f"{d}/documents.parquet"
    embs = f"{d}/embeddings.parquet"
    if not os.path.exists(docs):
        continue
    mtime = int(os.path.getmtime(docs))
    n, toks, avg, dup = duckdb.sql(
        f"""SELECT count(*), sum(len(string_split(text,' '))),
                   round(avg(len(string_split(text,' '))),1),
                   count(*) - count(DISTINCT md5(text))
            FROM '{docs}'"""
    ).fetchall()[0]
    ne, dim = duckdb.sql(
        f"SELECT count(*), max(len(embedding)) FROM '{embs}'"
    ).fetchall()[0]
    print(
        f"{os.path.basename(d):8s} mtime={mtime} docs={n} tokens={toks} "
        f"avg_tokens={avg} exact_dup_docs={dup} vecs={ne} dim={dim}"
    )
