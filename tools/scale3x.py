#!/usr/bin/env python3
"""Generate an N-x scaled copy of a testdata SF directory for scaling
measurements (SURVEY.md §5): N key-shifted copies that preserve FK
structure exactly.

- every key/id column is shifted by copy_index * 10^9, so copies are
  disjoint subgraphs / disjoint key ranges with identical per-copy
  structure;
- document texts get a per-copy word prefix (copy 0 unchanged), so
  shingle/near-dup pair structure stays strictly per-copy (n_chars is
  recomputed);
- embeddings are dimension-rotated per copy (norms preserved, cross-copy
  identity broken) keeping float32;
- everything else (timestamps, money, props) is copied bit-for-bit.

Usage: python3 tools/scale3x.py <srcDir> <dstDir> [copies=3]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-copy key offset: picked per RUN as the smallest power of 10 above
# every key value (a fixed 10^9 overflows int32 key columns once
# copies*OFF exceeds 2^31 — seen generating the 10x set)
OFF = 10 ** 9
KEY_COLS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
    "doc_id", "vec_id",
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def copy_table(t: pa.Table, i: int, name: str) -> pa.Table:
    cols = []
    for field in t.schema:
        col = t.column(field.name)
        if field.name in KEY_COLS and i > 0:
            col = pc.add(col, i * OFF).cast(field.type)
        elif name == "documents" and field.name == "text" and i > 0:
            texts = col.to_pylist()
            col = pa.array(
                [" ".join(f"c{i}{w}" for w in s.split(" ")) for s in texts],
                type=field.type)
        elif name == "documents" and field.name == "n_chars" and i > 0:
            texts = t.column("text").to_pylist()
            col = pa.array(
                [len(" ".join(f"c{i}{w}" for w in s.split(" "))) for s in texts],
                type=field.type)
        elif name == "embeddings" and field.name == "embedding" and i > 0:
            mat = np.array(col.to_pylist(), dtype=np.float32)
            mat = np.roll(mat, i, axis=1)
            col = pa.array(list(mat), type=field.type)
        cols.append(col)
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=t.schema)


def pick_off(src: str, copies: int) -> int:
    global OFF
    import pyarrow.types as pt
    mx, has32 = 0, False
    for name in TABLES:
        t = pq.read_table(f"{src}/{name}.parquet")
        for field in t.schema:
            if field.name in KEY_COLS:
                v = pc.max(t.column(field.name)).as_py()
                mx = max(mx, v or 0)
                has32 = has32 or pa.types.is_int32(field.type)
    off = 10
    while off <= mx:
        off *= 10
    if has32 and (copies - 1) * off + mx > 2**31 - 1:
        raise SystemExit(f"copies={copies} * off={off} overflows int32 keys")
    OFF = off
    print(f"key offset: {off} (max key {mx})")


def main(src: str, dst: str, copies: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    pick_off(src, copies)
    for name in TABLES:
        t = pq.read_table(f"{src}/{name}.parquet")
        out = pa.concat_tables([copy_table(t, i, name) for i in range(copies)])
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
