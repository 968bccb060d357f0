"""Upsample the driver's sf0.1 tables to an sf1-LIKE dataset for local
measurement (the driver's round-end bench escalates to sf=1.0, which is
not shipped under /root/testdata). 10 key-offset copies per table:

- every table's primary key (and the foreign keys referencing it) shifts
  by i x (max_key + 1) in copy i, so per-key join cardinalities and
  group sizes match the driver generator's scaling (each custkey still
  owns the same order count, each orderkey the same line count);
- user_id / doc_id / vec_id ranges scale 10x, so the catalog's bounded
  slices (user_id < 100, doc_id < 300, vec_id < 2000) stay constant-size
  exactly as they do between the driver's sf0.1 and sf1.0 (BENCH_r06:
  lag_gap_events 0.177 s @ sf0.1 vs 0.173 s @ sf1.0);
- nation/region/supplier dims stay fixed (driver keeps 25/5 rows).

Distributions (lang mix, priority mix, value quantiles) are inherited
unchanged from sf0.1. Numbers measured on this dataset are cited as
"sf1-like" in OPTIMIZATION_r07.md — relative (plan-shape) comparisons,
not artifact-of-record numbers (those come from bench.py at sf0.1).

Usage: python BENCH/upsample.py [src] [dst] [factor]
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/sf1like"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns shifted by i * (max(primary domain) + 1)
SHIFT = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "nation": {},
    "region": {},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    # domain spans from the ORIGINAL tables (key space of copy 0)
    span: dict[str, int] = {}
    for t, shifts in SHIFT.items():
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        for col, dom in shifts.items():
            if dom == col:
                span[dom] = int(pc.max(tab[col]).as_py()) + 1
    for t, shifts in SHIFT.items():
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        if not shifts:
            pq.write_table(tab, os.path.join(DST, f"{t}.parquet"))
            continue
        copies = []
        for i in range(FACTOR):
            c = tab
            for col, dom in shifts.items():
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c[col], pa.scalar(i * span[dom],
                                                   type=c[col].type))
                c = c.set_column(idx, c.schema.field(col), shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(DST, f"{t}.parquet"))
        print(t, out.num_rows)


if __name__ == "__main__":
    main()
