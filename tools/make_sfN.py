"""Synthesize a larger scale factor from sf0.1 by key-offset replication.

The driver ships sf0.001/0.01/0.1 only; the 100 TB story needs at least
one measured 10x point to turn "local constants vanish at scale" into a
curve (VERDICT r4 item 6). Replica r (r = 0 is the identity copy) adds
a per-key-domain stride to every key column, so

- all FK edges (dq.FK_EDGES) stay orphan-free,
- key cardinalities really grow 10x (no artificial hot keys),
- dims (region, nation) stay fixed, like a real warehouse.

Document text is perturbed per replica: every 5th word becomes a
replica+position token ("r<r>p<i%17>"), so ~60 % of each doc's 3-gram
shingles change and cross-replica Jaccard/containment falls below the
dedup thresholds. A plain suffix was not enough — it left every doc
with 9 near-identical twins, and one ~100-doc identical group in the
source corpus became a ~1000-doc near-clique whose PageRank oracle
spilled >80 GB in DuckDB. Real 10x corpora add mostly-new text; this
keeps the dedup pair counts scaling ~linearly with sf. n_chars is
recomputed from the new text. Embeddings replicate verbatim
(identical vectors tie-break deterministically by id in both
engines).

Everything is written with pyarrow, preserving the exact source arrow
schema (notably events.ts timestamp[ns]) so both engines read the
replica exactly like the original.

Run:  python tools/make_sfN.py [factor=10] [src=/root/testdata/sf0.1]
writes /root/repo/.artifacts/sf<factor*src_sf>/ parquet tables.

DO NOT CHAIN GENERATIONS (e.g. sf1-from-sf0.1 then sf10-from-sf1):
the replica tokens are ``r<replica>p<pos>``, so a second generation
re-uses replica indices 0..9 and its perturbed docs COLLIDE with the
first generation's replica families — cross-generation near-dup pairs
then grow quadratically by construction (measured: containment pairs
went exactly linear sf0.1→sf1 but 100x for 10x docs on a chained
sf10). Always synthesize from the BASE corpus with a single factor
(sf10 = factor 100 from sf0.1), which keeps every replica's token
namespace distinct and pair growth linear.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: per-key-domain strides, far above each domain's max key
OFF = {
    "custkey": 10_000_000,
    "suppkey": 1_000_000,
    "partkey": 10_000_000,
    "orderkey": 100_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 1_000_000,
}

#: table -> {column: stride-name}
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

DIMS = ("region", "nation")


def _shift(col: pa.ChunkedArray, delta: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(delta, type=col.type))


def replicate(src: str, dst: str, factor: int) -> None:
    # TABLES=documents,embeddings restricts generation — the sf100
    # scale-curve point only needs the corpus tables, and a full
    # factor-1000 lineitem (600M rows) would cost disk for specs the
    # curve does not measure.
    only = os.environ.get("TABLES")
    only_set = set(only.split(",")) if only else None
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        if only_set is not None and t not in only_set:
            continue
        pq.write_table(
            pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        if only_set is not None and t not in only_set:
            continue
        base = pq.read_table(f"{src}/{t}.parquet")
        reps = []
        for r in range(factor):
            tbl = base
            for colname, dom in keys.items():
                idx = tbl.schema.get_field_index(colname)
                tbl = tbl.set_column(
                    idx,
                    tbl.schema.field(idx),
                    _shift(tbl.column(idx), r * OFF[dom]),
                )
            if t == "documents" and r > 0:
                ti = tbl.schema.get_field_index("text")
                ni = tbl.schema.get_field_index("n_chars")

                def perturb(s: str) -> str:
                    ws = s.split(" ")
                    for i in range(0, len(ws), 5):
                        ws[i] = f"r{r}p{i % 17}"
                    return " ".join(ws)

                new_texts = [
                    perturb(v) if v is not None else None
                    for v in tbl.column(ti).to_pylist()
                ]
                tbl = tbl.set_column(
                    ti,
                    tbl.schema.field(ti),
                    pa.array(new_texts, type=tbl.schema.field(ti).type),
                )
                tbl = tbl.set_column(
                    ni,
                    tbl.schema.field(ni),
                    pa.array(
                        [
                            len(v) if v is not None else None
                            for v in new_texts
                        ],
                        type=tbl.schema.field(ni).type,
                    ),
                )
            reps.append(tbl)
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    src_sf = float(src.rstrip("/").rsplit("sf", 1)[-1])
    sf = round(src_sf * factor, 6)
    tag = f"sf{int(sf) if sf == int(sf) else sf}"
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".artifacts",
        tag,
    )
    replicate(src, dst, factor)
    print(dst)


if __name__ == "__main__":
    main()
