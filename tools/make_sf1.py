#!/usr/bin/env python3
"""Amplify the sf0.1 corpus x10 into testdata/sf1 (repo-local scale point).

Key-shifted copies preserve referential integrity: every foreign key
shifts by the same per-copy offset as its dimension's primary key
(orders.o_custkey moves with customer.c_custkey, lineitem's three FKs
move with orders/part/supplier). Fixed dims (region, nation) copy
unchanged, as TPC-H scaling does. Timestamps keep their source parquet
types bit-for-bit (events.ts has shipped as TIMESTAMP(NANOS) and as
TIMESTAMP(MICROS) across corpus generations; the Spark loader adapts
to either -- see Tables.normalizeEvents -- so the amplifier must not
rewrite the physical type out from under it).

Content columns:
  - documents: each copy appends a short per-copy marker to `text`
    (n_chars recomputed). Within a copy the corpus's exact-dup structure
    is preserved; across copies documents become near-dup families --
    the realistic crawl shape, and real work for the dedup operators.
  - embeddings: a tiny deterministic per-(copy, dim) perturbation breaks
    exact similarity ties between copies (cosine is scale-invariant, so
    plain scaling would NOT); top-k orderings stay deterministic.

Usage: python3 tools/make_sf1.py [src_dir dst_dir n_copies]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-copy key offsets; multiples of 10 keep events' key%10 tenant and
# per-process routing distributions identical in every copy
OFFSETS = {
    "c_custkey": 10**6,
    "o_orderkey": 10**7,
    "o_custkey": 10**6,
    "l_orderkey": 10**7,
    "l_partkey": 10**6,
    "l_suppkey": 10**5,
    "p_partkey": 10**6,
    "s_suppkey": 10**5,
    "event_id": 10**7,
    "user_id": 10**6,
    "doc_id": 10**6,
    "vec_id": 10**5,
}

ROW_GROUP = 250_000


def shifted_copies(tbl: pa.Table, transform=None) -> pa.Table:
    outs = []
    for i in range(N):
        cols = []
        for name in tbl.schema.names:
            col = tbl.column(name).combine_chunks()
            if name in OFFSETS:
                col = pc.add(col, i * OFFSETS[name])
            cols.append(col)
        out = pa.table(cols, names=list(tbl.schema.names))
        if transform is not None:
            out = transform(out, i)
        outs.append(out)
    return pa.concat_tables(outs).cast(tbl.schema)


def write(name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(DST, f"{name}.parquet"),
                   row_group_size=ROW_GROUP)
    print(f"{name}: {tbl.num_rows} rows")


def doc_variant(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    texts = [t + f" cx{i}" for t in tbl.column("text").to_pylist()]
    arr = pa.array(texts, type=pa.string())
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text", arr)
    n = pa.array([len(t) for t in texts], type=pa.int64())
    return tbl.set_column(tbl.schema.get_field_index("n_chars"), "n_chars", n)


def emb_variant(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    vecs = tbl.column("embedding").to_pylist()
    out = [
        [x + i * 0.001 * ((d % 7) - 3) for d, x in enumerate(v)]
        for v in vecs
    ]
    arr = pa.array(out, type=pa.list_(pa.float32()))
    return tbl.set_column(tbl.schema.get_field_index("embedding"),
                          "embedding", arr)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        write(name, tbl)
    for name in ("customer", "supplier", "part", "orders", "lineitem",
                 "events"):
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        write(name, shifted_copies(tbl))
    write("documents", shifted_copies(
        pq.read_table(os.path.join(SRC, "documents.parquet")), doc_variant))
    write("embeddings", shifted_copies(
        pq.read_table(os.path.join(SRC, "embeddings.parquet")), emb_variant))


if __name__ == "__main__":
    main()
