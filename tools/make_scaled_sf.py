#!/usr/bin/env python3
"""Deterministically scale the driver's sf0.1 testdata by an integer factor.

Round-5 sf1 replay tool (VERDICT r4 item 1): the driver ships
sf{0.001,0.01,0.1}; the judge asks for the 74-query oracle replay at sf1
(100x the gate). This synthesizes sf1 as K=10 shifted replicas of sf0.1,
preserving every contract the queries and their mirrored oracles rely on:

- key strides are chosen so replica id-spaces are disjoint AND the planted
  duplicate offsets stay clear: doc_id stride 100_000 keeps all base ids
  (< 10*100_000+5_000) below the +1M/+2M/+3M planted clones of
  SparkEntry.docsDup, and 100_000 % 20 == 100_000 % 25 == 0 preserves the
  planting residues per replica;
- l_orderkey stride 1_000_000 shifts the page id d = l_orderkey*8 +
  l_linenumber by 8M, which is divisible by every residue base the page
  content functions use for planted structure (8, 10, 20, 25, 1000);
- replica k>0 document text gets every alphanumeric token suffixed with
  'q<k>z', so replicas are token-disjoint: cross-replica shingle Jaccard is
  exactly 0 and the distinct-text corpus really is K times larger (plain
  replication would collapse to the sf0.1 distinct-text set under the
  pre-collapse dedup, testing nothing);
- embeddings get a per-replica cyclic dimension rotation: within-replica
  pairwise geometry (dots, norms, cosines) is preserved exactly while
  cross-replica vectors are not duplicates, so planted ANN structure scales
  without cosine ties; vec_id stride 100_000 stays below the +1M clones;
- events shift ts by k*31 days so temporal structure replicates instead of
  stacking 10x density into the same month;
- FK strides are applied consistently on both sides of every join
  (orders.o_custkey <-> customer.c_custkey etc.); nation/region stay as-is
  (dim tables: groups merge across replicas, which every aggregate mirrors).

Both graft.Verify and the DuckDB oracle read the SAME scaled tables, so the
compare stays a true two-implementation check at sf1.

Usage: python3 tools/make_scaled_sf.py [SRC_DIR OUT_DIR K]
       defaults: /root/testdata/sf0.1 /root/repo/.tmp/sf1 10
"""
import sys
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# DOC/VEC strides * K must stay below the +1M planted-clone id offsets of
# SparkEntry.docsDup / q43 / q79, and the embedding rotation needs K distinct
# rotations within EMB_DIM=64 — fail loudly instead of silently overlapping
assert 1 <= K <= 10, f"K={K}: replica id-spaces collide with planted-clone offsets past K=10"

DOC_STRIDE = 100_000     # < 1_000_000 planted-clone offset for K<=10; %20==%25==0
VEC_STRIDE = 100_000
ORDER_STRIDE = 1_000_000  # d stride 8M: divisible by 8,10,20,25,1000
CUST_STRIDE = 100_000
PART_STRIDE = 100_000
SUPP_STRIDE = 10_000
EVENT_STRIDE = 1_000_000
USER_STRIDE = 10_000
EMB_DIM = 64


def replica_selects(template):
    return "\nUNION ALL\n".join(template(k) for k in range(K))


def write(name, sql):
    src_schema = pq.read_schema(f"{SRC}/{name}.parquet")
    # strip pandas metadata; keep field names/types byte-identical
    schema = pa.schema([src_schema.field(i) for i in range(len(src_schema.names))])
    tbl = duckdb.sql(sql).arrow()
    tbl = tbl.cast(schema)
    pq.write_table(tbl, f"{OUT}/{name}.parquet")
    print(f"{name}: {tbl.num_rows} rows")


def main():
    import os
    os.makedirs(OUT, exist_ok=True)

    for dim in ("nation", "region"):
        write(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")

    write("lineitem", replica_selects(lambda k: f"""
SELECT l_orderkey + {k * ORDER_STRIDE} AS l_orderkey,
       l_partkey + {k * PART_STRIDE} AS l_partkey,
       l_suppkey + {k * SUPP_STRIDE} AS l_suppkey,
       l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM '{SRC}/lineitem.parquet'"""))

    write("orders", replica_selects(lambda k: f"""
SELECT o_orderkey + {k * ORDER_STRIDE} AS o_orderkey,
       o_custkey + {k * CUST_STRIDE} AS o_custkey,
       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM '{SRC}/orders.parquet'"""))

    write("customer", replica_selects(lambda k: f"""
SELECT c_custkey + {k * CUST_STRIDE} AS c_custkey,
       c_name, c_nationkey, c_acctbal, c_mktsegment
FROM '{SRC}/customer.parquet'"""))

    write("part", replica_selects(lambda k: f"""
SELECT p_partkey + {k * PART_STRIDE} AS p_partkey,
       p_name, p_brand, p_type, p_size, p_retailprice
FROM '{SRC}/part.parquet'"""))

    write("supplier", replica_selects(lambda k: f"""
SELECT s_suppkey + {k * SUPP_STRIDE} AS s_suppkey,
       s_name, s_nationkey, s_acctbal
FROM '{SRC}/supplier.parquet'"""))

    def doc_sel(k):
        if k == 0:
            text = "text"
        else:
            # suffix every alphanumeric run so ANY alnum-run tokenizer sees
            # fully replica-distinct tokens (punctuation-splitting cannot
            # leak a shared token); length changes, so n_chars tracks it
            text = rf"regexp_replace(text, '([A-Za-z0-9]+)', '\1q{k}z', 'g')"
        return f"""
SELECT doc_id + {k * DOC_STRIDE} AS doc_id, {text} AS text,
       lang, source, CAST(length({text}) AS BIGINT) AS n_chars
FROM '{SRC}/documents.parquet'"""
    write("documents", replica_selects(doc_sel))

    def emb_sel(k):
        if k == 0:
            emb = "embedding"
        else:
            emb = (f"list_concat(embedding[{k + 1}:{EMB_DIM}],"
                   f" embedding[1:{k}])")
        return f"""
SELECT vec_id + {k * VEC_STRIDE} AS vec_id,
       CAST({emb} AS FLOAT[]) AS embedding, label
FROM '{SRC}/embeddings.parquet'"""
    write("embeddings", replica_selects(emb_sel))

    write("events", replica_selects(lambda k: f"""
SELECT event_id + {k * EVENT_STRIDE} AS event_id,
       ts + INTERVAL {k * 31} DAY AS ts,
       user_id + {k * USER_STRIDE} AS user_id,
       event_type, value, props
FROM '{SRC}/events.parquet'"""))


if __name__ == "__main__":
    main()
