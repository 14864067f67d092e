#!/usr/bin/env python3
"""Seeded random corpus generator for oracle-gate fuzzing.

The driver's correctness gate compares Spark vs DuckDB on a FIXED
fixture (TESTDATA.md, seed=42). Engine-difference bugs that the fixed
corpus happens not to exercise (hash boundaries, rounding ties, date
edges, collation) surface only under different data — this tool
generates a schema-identical corpus from any seed so the same gate can
run on arbitrarily many corpora:

    python3 tools/gen_fuzz_corpus.py 1234 /tmp/fuzz_1234
    sbt -batch "runMain graft.Verify /tmp/fuzz_1234 /tmp/fuzz_1234_out"
    python3 tools/check_correctness.py /tmp/fuzz_1234 /tmp/fuzz_1234_out

Row-count knobs (VERDICT r8 #1 — the measured scale-stress witness)
scale individual tables so the pair-machinery family can be gated and
benched at 10x+ the fixture's document count:

    python3 tools/gen_fuzz_corpus.py 42 /tmp/scale_base \
        --n-docs 5000 --n-vec 2000 --n-events 10000 --n-orders 12000
    python3 tools/gen_fuzz_corpus.py 42 /tmp/scale_10x \
        --n-docs 50000 --n-vec 20000 --n-events 100000 --n-orders 12000

When --n-vocab is omitted it is DERIVED as 32*(n_docs/500)**(1/3)
(rounded; 69 at 5000 docs, 149 at 50000) so 3-shingle document
frequency stays at the fixture's level — a fixed 32-token vocabulary
at 10x the docs would densify near-dup pair counts ~100x and the
scale witness would measure corpus densification, not the operators
(ADVICE r9). n_docs=500 derives exactly the historical 32, so the
twelve-seed sweep corpora stay byte-identical; pass --n-vocab
explicitly to pin any other shape.

Defaults reproduce the historical fuzz shape (500/500/900/1200), so
the twelve-seed sweep's corpora are unchanged.

Shapes mirror the fixture's documented invariants (the contracts the
queries assume): sequential doc_ids with the benchmark set at
doc_id < 10, documents of >= 10 ASCII whitespace tokens, 64-dim
float32 embeddings, events.ts as TIMESTAMP(NANOS) with JSON props
{"k": int}, TPC-H-ish FK consistency (lineitem -> orders -> customer
-> nation -> region), 1995+ date ranges so the fixed query literals
stay selective.

Known residual FAIL class on some seeds (documented, not a bug): a
rounded output value landing EXACTLY on a decimal tie (x.xx5) rounds
one ulp apart in Spark (shortest-decimal rendering via BigDecimal)
vs DuckDB (binary double). 2-decimal inputs keep SUMS tie-free (see
the events.value comment), but divisions (avg, percentile
interpolation) can land on ties — e.g. seed 424242 hits 2 such
values. Treat a 1-ulp diff in a rounded float column as this class;
anything else is a real bug.
"""
import json
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(seed: int, outdir: str, n_docs: int = 500, n_vec: int = 500,
         n_events: int = 900, n_orders: int = 1200,
         n_vocab: int = None) -> None:
    if n_vocab is None:
        # df-preserving default: vocab**3 scales with n_docs (see module
        # docstring). Exactly 32 at the historical 500-doc shape.
        n_vocab = round(32 * (n_docs / 500) ** (1 / 3))
    rnd = random.Random(seed)
    import os
    os.makedirs(outdir, exist_ok=True)

    def write(name, data, schema):
        t = pa.Table.from_pydict(data, schema=schema)
        pq.write_table(t, f"{outdir}/{name}.parquet")

    # ---- region / nation --------------------------------------------------
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write("region",
          {"r_regionkey": list(range(5)), "r_name": regions},
          pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
    write("nation",
          {"n_nationkey": list(range(25)),
           "n_name": [f"NATION_{i}" for i in range(25)],
           "n_regionkey": [rnd.randrange(5) for _ in range(25)]},
          pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                     ("n_regionkey", pa.int32())]))

    # ---- customer / supplier / part --------------------------------------
    n_cust = 120
    segs = ["FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE"]
    write("customer",
          {"c_custkey": list(range(n_cust)),
           "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
           "c_nationkey": [rnd.randrange(25) for _ in range(n_cust)],
           "c_acctbal": [round(rnd.uniform(-999, 9999), 2) for _ in range(n_cust)],
           "c_mktsegment": [rnd.choice(segs) for _ in range(n_cust)]},
          pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                     ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                     ("c_mktsegment", pa.string())]))
    n_supp = 8
    write("supplier",
          {"s_suppkey": list(range(n_supp)),
           "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
           "s_nationkey": [rnd.randrange(25) for _ in range(n_supp)],
           "s_acctbal": [round(rnd.uniform(-999, 9999), 2) for _ in range(n_supp)]},
          pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                     ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))
    n_part = 150
    adjs = ["cold", "hot", "small", "large", "shiny", "dull", "quick", "slow"]
    nouns = ["widget", "gadget", "bolt", "gear", "valve", "lever"]
    types = ["ECONOMY", "STANDARD", "PROMO", "SMALL", "MEDIUM", "LARGE"]
    write("part",
          {"p_partkey": list(range(n_part)),
           "p_name": [f"{rnd.choice(adjs)} {rnd.choice(nouns)}" for _ in range(n_part)],
           "p_brand": [f"Brand#{rnd.randrange(10, 35)}" for _ in range(n_part)],
           "p_type": [rnd.choice(types) for _ in range(n_part)],
           "p_size": [rnd.randrange(1, 51) for _ in range(n_part)],
           "p_retailprice": [round(rnd.uniform(100, 2000), 2) for _ in range(n_part)]},
          pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                     ("p_brand", pa.string()), ("p_type", pa.string()),
                     ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    # ---- orders / lineitem -----------------------------------------------
    day_ms = 86400000
    epoch_1995 = 788918400000  # 1995-01-01 UTC in ms
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o_dates = [epoch_1995 + rnd.randrange(0, 2400) * day_ms for _ in range(n_orders)]
    write("orders",
          {"o_orderkey": list(range(n_orders)),
           "o_custkey": [rnd.randrange(n_cust) for _ in range(n_orders)],
           "o_orderstatus": [rnd.choice(statuses) for _ in range(n_orders)],
           "o_totalprice": [round(rnd.uniform(1000, 400000), 2) for _ in range(n_orders)],
           "o_orderdate": o_dates,
           "o_orderpriority": [rnd.choice(prios) for _ in range(n_orders)]},
          pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                     ("o_orderdate", pa.timestamp("ms")),
                     ("o_orderpriority", pa.string())]))
    li = {k: [] for k in ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                          "l_returnflag", "l_linestatus", "l_shipdate"]}
    for ok in range(n_orders):
        for ln in range(1, rnd.randrange(1, 8)):
            li["l_orderkey"].append(ok)
            li["l_partkey"].append(rnd.randrange(n_part))
            li["l_suppkey"].append(rnd.randrange(n_supp))
            li["l_linenumber"].append(ln)
            li["l_quantity"].append(float(rnd.randrange(1, 51)))
            li["l_extendedprice"].append(round(rnd.uniform(1000, 100000), 2))
            li["l_discount"].append(round(rnd.uniform(0, 0.1), 2))
            li["l_tax"].append(round(rnd.uniform(0, 0.08), 2))
            li["l_returnflag"].append(rnd.choice(["A", "N", "R"]))
            li["l_linestatus"].append(rnd.choice(["O", "F"]))
            li["l_shipdate"].append(o_dates[ok] + rnd.randrange(1, 122) * day_ms)
    write("lineitem", li,
          pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                     ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                     ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                     ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                     ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                     ("l_shipdate", pa.timestamp("ms"))]))

    # ---- events (TIMESTAMP NANOS + JSON props) ----------------------------
    epoch_2024_ns = 1704067200000000000  # 2024-01-01 UTC in ns
    etypes = ["view", "click", "purchase", "signup", "error"]
    ts = sorted(epoch_2024_ns + rnd.randrange(0, 30 * 86400 * 10**9)
                for _ in range(n_events))
    write("events",
          {"event_id": list(range(n_events)),
           "ts": ts,
           "user_id": [rnd.randrange(15) for _ in range(n_events)],
           "event_type": [rnd.choice(etypes) for _ in range(n_events)],
           # 2 decimals like the fixture — this is a real invariant, not
           # cosmetics: sums of 2-decimal values have <= 2 true decimals,
           # so round(sum, 2) sits >= 0.005 from any boundary and binary
           # error can never flip it. 3-decimal values put true sums
           # EXACTLY on x.xx5 ties, where Spark (rounds the shortest
           # decimal rendering) and DuckDB (rounds the binary double)
           # legitimately disagree by one cent — an engine-semantics
           # difference, not a bug, and excluded from generated corpora
           # the same way the fixture excludes it.
           "value": [round(rnd.uniform(0, 100), 2) for _ in range(n_events)],
           "props": [json.dumps({"k": rnd.randrange(100)}) for _ in range(n_events)]},
          pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
                     ("user_id", pa.int64()), ("event_type", pa.string()),
                     ("value", pa.float64()), ("props", pa.string())]))

    # ---- documents (>= 10 ASCII tokens, small shared vocab) ---------------
    # Default matches the fixture's document count so corpus-size-derived
    # split points (q81's 90% cut) land on the same boundary shape; with
    # fewer docs than the old hard cut the delta set was empty and q81
    # passed vacuously on every seed (ADVICE r5). --n-docs overrides for
    # the scale-stress corpora (VERDICT r8 #1).
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "table", "scan", "merge",
             "sort", "hash", "join", "group", "filter", "query", "spark", "data",
             "row", "key", "value", "batch", "stream", "window", "fast", "slow",
             "big", "small", "the", "a", "line", "part", "dup", "node"]
    # --n-vocab grows the vocabulary for the scale corpora. A FIXED
    # vocab under 10x the docs densifies shingle df ~10x and near-dup
    # pair counts ~100x — an artificial quadratic regime no real corpus
    # shows (vocabulary grows with corpus size; pair density per doc
    # stays roughly constant). Scaling vocab with n_docs**(1/3) keeps
    # the 3-shingle space ∝ n_docs, i.e. per-shingle df ≈ the fixture's
    # (~8), so base-vs-10x wall-time ratios measure the operators, not
    # corpus densification. Default 32 = the historical list, byte-
    # identical corpora for the twelve-seed sweep.
    if n_vocab > len(vocab):
        vocab = vocab + [f"tok{i}" for i in range(n_vocab - len(vocab))]
    elif n_vocab < len(vocab):
        vocab = vocab[:n_vocab]
    langs = ["en", "es", "de", "fr", "zh"]
    texts = []
    for i in range(n_docs):
        n_tok = rnd.randrange(10, 120)
        toks = [rnd.choice(vocab) for _ in range(n_tok)]
        # Seed some near-duplicate structure so the dedup family has
        # real work: ~10% of docs clone an earlier doc with light edits.
        if i > 20 and rnd.random() < 0.1:
            base = texts[rnd.randrange(i - 20, i)].split(" ")
            for _ in range(max(1, len(base) // 20)):
                base[rnd.randrange(len(base))] = rnd.choice(vocab)
            toks = base
        texts.append(" ".join(toks))
    write("documents",
          {"doc_id": list(range(n_docs)),
           "text": texts,
           "lang": [rnd.choice(langs) for _ in range(n_docs)],
           "source": [f"src{rnd.randrange(20)}" for _ in range(n_docs)],
           "n_chars": [len(t) for t in texts]},
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]))

    # ---- embeddings (64-dim float32, centroid ids at %125) ----------------
    embs = []
    for i in range(n_vec):
        center = [rnd.uniform(-1, 1) for _ in range(64)]
        embs.append([round(c + rnd.gauss(0, 0.3), 6) for c in center])
    write("embeddings",
          {"vec_id": list(range(n_vec)),
           "embedding": embs,
           "label": [rnd.randrange(10) for _ in range(n_vec)]},
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]))

    print(f"[gen_fuzz_corpus] seed={seed} -> {outdir}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("seed", type=int)
    ap.add_argument("outdir")
    ap.add_argument("--n-docs", type=int, default=500)
    ap.add_argument("--n-vec", type=int, default=500)
    ap.add_argument("--n-events", type=int, default=900)
    ap.add_argument("--n-orders", type=int, default=1200)
    ap.add_argument("--n-vocab", type=int, default=None)
    a = ap.parse_args()
    main(a.seed, a.outdir, n_docs=a.n_docs, n_vec=a.n_vec,
         n_events=a.n_events, n_orders=a.n_orders, n_vocab=a.n_vocab)
