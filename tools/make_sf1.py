#!/usr/bin/env python3
"""Builder-side tool (NOT engine code): synthesize an sf1 scale dir by
10x-replicating /root/testdata/sf0.1 with key offsets, for the round's
scale spot-run (VERDICT r10 #6). The driver only ships sf0.001/0.01/0.1;
sf1 is the cheapest local evidence that the heavy families' cap/band
discipline holds off the toy scale.

Replication semantics (per copy i in 0..9):
  - lineitem/orders: order keys offset by i*10_000_000 (preserves the
    lineitem->orders FK within each copy; 10x orders, 10x lineitem).
  - events: event_id/user_id offset -> 10x events AND 10x key
    cardinality, same 30-day window (10x densification, which is how
    real traffic scales).
  - documents/embeddings: ids offset, text/vectors CLONED -> every doc
    gains 9 near-identical twins. That makes the near-dup families
    strictly HARDER than organic sf1 (10-clone cliques everywhere):
    pair lists, components and cluster elections are ~10x denser than
    a real corpus. If the caps hold here, they hold on organic data.
  - dims (customer/supplier/part/nation/region): copied unchanged.

Output: /root/repo/benchdata/sf1/*.parquet (gitignored; ~150 MB).
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf1"
COPIES = 10
OFF = 10_000_000

os.makedirs(DST, exist_ok=True)


def offset_col(tbl, name, off):
    idx = tbl.schema.get_field_index(name)
    col = pa.compute.add(tbl.column(name), off)
    return tbl.set_column(idx, tbl.schema.field(idx), col)


def replicate(name, key_cols):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    writer = pq.ParquetWriter(f"{DST}/{name}.parquet", src.schema,
                              compression="snappy")
    for i in range(COPIES):
        t = src
        for k in key_cols:
            t = offset_col(t, k, i * OFF)
        writer.write_table(t)
    writer.close()
    print(f"{name}: {src.num_rows} -> {src.num_rows * COPIES}")


def copy(name):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{DST}/{name}.parquet", compression="snappy")
    print(f"{name}: {t.num_rows} (copied)")


replicate("lineitem", ["l_orderkey"])
replicate("orders", ["o_orderkey"])
replicate("events", ["event_id", "user_id"])
replicate("documents", ["doc_id"])
replicate("embeddings", ["vec_id"])
for d in ["customer", "supplier", "part", "nation", "region"]:
    copy(d)
