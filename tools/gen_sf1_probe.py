#!/usr/bin/env python3
"""Dev-only harness (NOT part of the engine): synthesize a 10x "sf1"
documents/embeddings corpus from the driver's sf0.1 tables, for the
one-off dedup/ANN scale probe recorded in PERF.md.

Construction keeps the ground truth linear in the scale factor so the
probe tests the ENGINE's asymptotics, not an artifact of the generator:

- documents: 10 shards; shard 0 is sf0.1 verbatim, shard k applies a
  letter-rotation cipher (a..z rotated by k, case-preserved) and
  offsets doc_id by k*100000. Rotation is a LENGTH-PRESERVING bijection
  on the alphabet, so within-shard duplicate structure (word-shingle
  Jaccard, char n-gram Jaccard, edit distance, text lengths — hence
  banded-DP cost) is IDENTICAL to sf0.1, while cross-shard vocabularies
  are disjoint: total dup pairs = 10x sf0.1, the near-linear target a
  real 10x corpus growth approximates. (An earlier token-PREFIX variant
  inflated text lengths ~30%, which quadratically inflated per-pair
  edit-distance cost and made the probe overstate editdist scaling.)
- embeddings: 10 shards; shard k rotates the dimension order by k
  (norm-preserving, direction-scrambling), so within-shard cosine
  structure is identical and cross-shard vectors are uncorrelated.

Usage: python3 tools/gen_sf1_probe.py [src_sf_dir] [out_dir]
"""
import sys

import pandas as pd

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main():
    import os
    os.makedirs(OUT, exist_ok=True)

    docs = pd.read_parquet(f"{SRC}/documents.parquet")

    def rot(text, k):
        def ch(c):
            if "a" <= c <= "z":
                return chr((ord(c) - 97 + k) % 26 + 97)
            if "A" <= c <= "Z":
                return chr((ord(c) - 65 + k) % 26 + 65)
            return c
        return "".join(ch(c) for c in text)

    out = []
    for k in range(SHARDS):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * 100000
        if k > 0:
            d["text"] = d["text"].map(lambda t, k=k: rot(t, k))
        out.append(d)
    alld = pd.concat(out, ignore_index=True)
    alld.to_parquet(f"{OUT}/documents.parquet", index=False)
    print(f"documents: {len(alld)} rows -> {OUT}/documents.parquet")

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    out = []
    for k in range(SHARDS):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + k * 100000
        if k > 0:
            e["embedding"] = e["embedding"].map(
                lambda v: list(v[k:]) + list(v[:k]))
        out.append(e)
    alle = pd.concat(out, ignore_index=True)
    # preserve the source's FLOAT[] element type: a plain to_parquet would
    # widen the python lists to double and change the scan/codegen shape
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "vec_id": pa.array(alle["vec_id"], type=pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in alle["embedding"]],
            type=pa.list_(pa.float32())),
        "label": pa.array(alle["label"], type=pa.int32()),
    })
    pq.write_table(t, f"{OUT}/embeddings.parquet")
    print(f"embeddings: {len(alle)} rows -> {OUT}/embeddings.parquet")

    # events (r10, for the drift/skyline/interp probes): shard k offsets
    # event_id and user_id (disjoint users => per-user aggregates are 10
    # disjoint copies, so skyline/TWAP group work is exactly 10x) while
    # ts / value / event_type copy verbatim => the cohort split point,
    # the distinct-value CDF frame, and the resample grid are IDENTICAL
    # to sf0.1 — the probe then isolates the scan/aggregate stages,
    # which are the only parts that should grow.
    import os as _os
    if _os.path.exists(f"{SRC}/events.parquet"):
        ev = pd.read_parquet(f"{SRC}/events.parquet")
        shards = []
        for k in range(SHARDS):
            e = ev.copy()
            e["event_id"] = e["event_id"] + k * 10_000_000
            e["user_id"] = e["user_id"] + k * 1_000_000
            shards.append(e)
        alle2 = pd.concat(shards, ignore_index=True)
        alle2.to_parquet(f"{OUT}/events.parquet", index=False)
        print(f"events: {len(alle2)} rows -> {OUT}/events.parquet")

    # TPC-H graph tables (r10, for the q_graph_bfs probe): shard k adds
    # a disjoint key offset to every join/graph key, so the bipartite
    # customer–supplier graph becomes 10 DISJOINT copies — frontier
    # sizes, edge counts, and relaxation work are exactly 10x sf0.1 by
    # construction (the linear ground truth the doc/embedding shards
    # give the dedup probes). Non-key columns are copied verbatim.
    # l_partkey is offset too (r10, for the co-purchase graph trio
    # q_triangle_count/q_link_predict/q_item_recs): without the offset
    # 10x baskets over the SAME part universe densify the co-occurrence
    # graph (support counts inflate superlinearly past the >= 2
    # threshold) and the probe would measure generator densification,
    # not engine asymptotics. With it, the graph is 10 disjoint copies.
    # Caveat: sf1 lineitem.l_partkey no longer joins the (unsharded)
    # part table — same standing caveat as l_suppkey/supplier; probes
    # are per-query opt-in, so only basket-keyed queries use sf1.
    import os.path
    if os.path.exists(f"{SRC}/orders.parquet"):
        koff = 10_000_000
        specs = [
            ("orders", ["o_orderkey", "o_custkey"]),
            ("lineitem", ["l_orderkey", "l_suppkey", "l_partkey"]),
            ("customer", ["c_custkey"]),
            # part: keys offset, NAMES copied verbatim — the distinct-name
            # universe stays fixed while rows grow 10x, which is the
            # realistic growth profile q_entity_match's vocabulary-bounded
            # claim is measured against.
            ("part", ["p_partkey"]),
            # supplier (r10, for q_hhi): s_suppkey matches lineitem's
            # offset so within-shard joins stay valid; s_nationkey is
            # offset too, so each shard is a disjoint supplier market —
            # per-nation concentration frames grow 10x linearly.
            ("supplier", ["s_suppkey", "s_nationkey"]),
        ]
        for tname, keys in specs:
            src = pd.read_parquet(f"{SRC}/{tname}.parquet")
            shards = []
            for k in range(SHARDS):
                s = src.copy()
                for c in keys:
                    s[c] = s[c] + k * koff
                shards.append(s)
            allt = pd.concat(shards, ignore_index=True)
            allt.to_parquet(f"{OUT}/{tname}.parquet", index=False)
            print(f"{tname}: {len(allt)} rows -> {OUT}/{tname}.parquet")


if __name__ == "__main__":
    main()
