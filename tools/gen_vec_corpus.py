#!/usr/bin/env python3
"""Seeded LARGE vector-corpus generator (embeddings table only).

The q36c 4096-cap witness needs a corpus past AnnPolicy.CoarseRouteBound
(ceil(sqrt(n)) > 4096 <=> n > 4095^2 ~ 16.77M vectors) — two orders of
magnitude past what tools/gen_fuzz_corpus.py's pure-Python row loop can
generate in reasonable time. This tool writes ONLY embeddings.parquet
(the sole table the ANN witness harnesses read), with the exact same
shape and distribution as the fuzz generator's embeddings section:
64-dim float32, each vector = uniform(-1,1) center + gauss(0, 0.3)
noise rounded to 6 dp, labels uniform over 10 — i.e. near-random
vectors, the hard case for IVF recall (recall tracks scanned fraction).

    python3 tools/gen_vec_corpus.py 42 /tmp/scale_cap_r17 16900000

Chunked (1M rows per row group) so peak memory stays ~1 GB and Spark
gets row-group-level read parallelism from the single file.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(seed: int, outdir: str, n_vec: int) -> None:
    import os
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    chunk = 1_000_000
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    writer = pq.ParquetWriter(f"{outdir}/embeddings.parquet", schema)
    done = 0
    while done < n_vec:
        m = min(chunk, n_vec - done)
        v = (rng.uniform(-1, 1, (m, 64)) +
             rng.normal(0, 0.3, (m, 64))).round(6).astype(np.float32)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(v.ravel()), 64) \
            .cast(pa.list_(pa.float32()))
        t = pa.Table.from_arrays(
            [pa.array(np.arange(done, done + m, dtype=np.int64)),
             arr,
             pa.array(rng.integers(0, 10, m, dtype=np.int32))],
            schema=schema)
        writer.write_table(t, row_group_size=m)
        done += m
        print(f"[gen_vec_corpus] {done}/{n_vec}", flush=True)
    writer.close()
    print(f"[gen_vec_corpus] seed={seed} n={n_vec} -> {outdir}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))
