#!/usr/bin/env python3
"""Deterministic sf1 replica builder: 10 key-shifted copies of the driver's
sf0.1 tables, written to an untracked dir (default /root/repo/.tmp/sf1).

The driver ships sf{0.001,0.01,0.1} only; the sf1 oracle replay (VERDICT r4
item 1, "100x the correctness gate") needs an sf1-shaped input. Both the
engine and the DuckDB oracle read THE SAME parquet tables, so any
deterministic scaling that preserves the tables' structural invariants keeps
the compare valid. Replica construction (replica k = 0..9):

- lineitem / orders: l_orderkey / o_orderkey + k*1_000_000 (same shift on
  both sides of the join key; max base orderkey is 149_999), o_custkey +
  k*100_000. The derived page id d = l_orderkey*8 + l_linenumber stays
  closed-form-safe for any Long.
- documents: doc_id + k*100_000 (max base 4_999, so every id stays below the
  1/2/3-million planted-counterpart offsets). Replica k>0 suffixes EVERY
  whitespace token with "r{k}" — within-replica text structure (exact-dup
  groups, mod-25 planted classes, shingle sets) is isomorphic to sf0.1 while
  cross-replica token sets are disjoint (Jaccard 0), so the planted-pair
  oracles (q17/q23/q24/q25) stay exact instead of drowning in cross-replica
  near-dups. n_chars is recomputed from the new text.
- embeddings: vec_id + k*100_000; replica k>0 applies a fixed seeded
  permutation of the 64 dims to every vector — all within-replica distances
  are preserved exactly, while cross-replica cosines concentrate near 0
  (64-dim random direction), far from any near-dup threshold or top-k tie.
- events: event_id + k*100_000, user_id + k*10_000, ts + k*32 days (each
  replica lands in disjoint hourly windows).
- region/nation/customer/supplier/part: copied as-is (dims; nation is the
  25-row broadcast side everywhere).

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/root/repo/.tmp/sf1]
"""
import os
import random
import shutil
import sys

import duckdb

REPLICAS = 10


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")

    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"copied {t}")

    def scale(table: str, select_for_k, order: str) -> None:
        parts = " UNION ALL ".join(
            f"SELECT {select_for_k(k)} FROM '{src}/{table}.parquet'"
            for k in range(REPLICAS))
        con.execute(
            f"COPY (SELECT * FROM ({parts}) ORDER BY {order}) TO "
            f"'{dst}/{table}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"wrote {table}: {n} rows")

    scale("lineitem",
          lambda k: f"* REPLACE (l_orderkey + {k} * 1000000 AS l_orderkey)",
          "l_orderkey, l_linenumber")

    scale("orders",
          lambda k: f"* REPLACE (o_orderkey + {k} * 1000000 AS o_orderkey, "
                    f"o_custkey + {k} * 100000 AS o_custkey)",
          "o_orderkey")

    def doc_select(k: int) -> str:
        if k == 0:
            return "*"
        text = f"regexp_replace(text, '(\\S+)', '\\1r{k}', 'g')"
        return (f"doc_id + {k} * 100000 AS doc_id, {text} AS text, lang, "
                f"source, CAST(length({text}) AS BIGINT) AS n_chars")
    scale("documents", doc_select, "doc_id")

    def emb_select(k: int) -> str:
        if k == 0:
            return "*"
        perm = list(range(64))
        random.Random(1000 + k).shuffle(perm)
        idx = ", ".join(str(i + 1) for i in perm)  # list_select is 1-based
        return (f"vec_id + {k} * 100000 AS vec_id, "
                f"list_select(embedding, [{idx}]) AS embedding, label")
    scale("embeddings", emb_select, "vec_id")

    scale("events",
          lambda k: f"* REPLACE (event_id + {k} * 100000 AS event_id, "
                    f"user_id + {k} * 10000 AS user_id, "
                    f"ts + INTERVAL ({k} * 32) DAY AS ts)",
          "event_id")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp/sf1"
    main(src, dst)
