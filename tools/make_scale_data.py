"""Deterministic 10x scale-up of an sf dir for SCALING measurements
(r16 VERDICT item 6: "prove the wins scale" — the plan-level wins are
under-observed at sf0.1 because the suite is overhead-bound there).

Builds sf<10x> from sf<x> with 10 replicas per table, key spaces kept
consistent across the star schema (every foreign key shifts by the
same replica offset as its dimension), physical parquet types
byte-identical to the source (events keeps timestamp[us]):

- region/nation: fixed (constant-size dimensions, as in TPC-H).
- customer/supplier/part/orders/lineitem: replica r shifts each key
  domain by r * (max_key + 1); attribute columns are copied, so value
  distributions are exactly the source's.
- events: event_id/user_id shift per replica (user count grows 10x,
  per-user event counts stay the source's); ts unchanged (same window
  — time-windowed operators see 10x density, the realistic growth
  mode for a fixed reporting window).
- documents: doc_id shifts; replica r > 0 interleaves a marker token
  "zq<r>x" every 3 tokens, which preserves INTRA-replica near-dup
  structure exactly (all replicas of a pair mutate identically) while
  driving CROSS-replica 3-gram jaccard far below banding thresholds
  (only ~1/4 of shingles are marker-free), so dedup workloads grow in
  n without collapsing into one giant cross-replica cluster.
- embeddings: vec_id shifts; replica r rolls the vector by r positions
  (norms and coordinate distributions preserved, replicas
  decorrelated).

This is a PERF twin, not an oracle twin: the driver's testdata stays
the only correctness source. Pure pyarrow — no Spark session.

Usage: python tools/make_scale_data.py [src_sf_dir] [dst_dir]
       (defaults: /root/testdata/sf0.1 -> /root/testdata_sf1/sf1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10

KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ("region", "nation")


def _domain_sizes(src: str) -> dict[str, int]:
    sizes: dict[str, int] = {}
    for table, cols in KEYED.items():
        t = pq.read_table(
            os.path.join(src, f"{table}.parquet"), columns=list(cols)
        )
        for col, dom in cols.items():
            m = pc.max(t.column(col)).as_py() or 0
            sizes[dom] = max(sizes.get(dom, 0), int(m) + 1)
    return sizes


def _mutate_documents(t: pa.Table, r: int) -> pa.Table:
    texts = t.column("text").to_pylist()
    marker = f"zq{r}x"
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        toks = s.split(" ")
        mutated: list[str] = []
        for i in range(0, len(toks), 3):
            mutated.extend(toks[i : i + 3])
            mutated.append(marker)
        out.append(" ".join(mutated[:-1]) if mutated else s)
    i = t.schema.get_field_index("text")
    t = t.set_column(i, "text", pa.array(out, pa.string()))
    j = t.schema.get_field_index("n_chars")
    return t.set_column(
        j,
        "n_chars",
        pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
    )


def _roll_embeddings(t: pa.Table, r: int) -> pa.Table:
    vecs = t.column("embedding").to_pylist()
    rolled = [
        None if v is None else (v[r % len(v):] + v[: r % len(v)])
        for v in vecs
    ]
    i = t.schema.get_field_index("embedding")
    return t.set_column(
        i, "embedding", pa.array(rolled, t.schema.field(i).type)
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/testdata_sf1/sf1"
    )
    os.makedirs(dst, exist_ok=True)
    sizes = _domain_sizes(src)
    print("key domain sizes:", sizes)

    for table in FIXED:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: copied {t.num_rows}")

    for table, cols in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        parts = []
        for r in range(REPLICAS):
            rep = t
            if table == "documents" and r > 0:
                rep = _mutate_documents(rep, r)
            if table == "embeddings" and r > 0:
                rep = _roll_embeddings(rep, r)
            for col, dom in cols.items():
                i = rep.schema.get_field_index(col)
                shifted = pc.add(
                    rep.column(col),
                    pa.scalar(r * sizes[dom], rep.schema.field(i).type),
                )
                rep = rep.set_column(i, col, shifted)
            parts.append(rep)
        out = pa.concat_tables(parts)
        pq.write_table(
            out,
            os.path.join(dst, f"{table}.parquet"),
            row_group_size=1 << 20,
        )
        print(f"{table}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
