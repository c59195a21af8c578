"""Device-time bisection of the fused pipeline via cut engines."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

cache = Path("tmp/jax_cache")
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_workload
from bowtie2_server_tpu.align.pipeline import UnpairedAligner
from bowtie2_server_tpu.index.fm import FmIndex
from bowtie2_server_tpu.io.fastq import make_batch

tmp = Path("tmp")
fa, names, seqs, quals = make_workload(tmp)
idx = FmIndex.load(tmp / "bench_genome_idx")
BATCH = int(__import__("os").environ.get("CUT_BATCH", "8192"))
batch = make_batch(names[:BATCH], seqs[:BATCH], quals[:BATCH])

import os
engines = os.environ.get(
    "ENGINES", "cut_seeds,cut_resolve,cut_dedup,cut_band,nodp,pallas"
).split(",")
for eng in engines:
    al = UnpairedAligner(idx, engine=eng)
    h = al.collect_async(batch)
    h[4][1].block_until_ready()
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        h = al.collect_async(batch)
        h[4][1].block_until_ready()
    t = (time.time() - t0) / reps
    # host-prep share: dispatch without waiting
    t0 = time.time()
    for _ in range(reps):
        h = al.collect_async(batch)
    t_prep = (time.time() - t0) / reps
    h[4][1].block_until_ready()
    print(f"{eng}: total={t*1e3:.1f}ms prep(async dispatch)={t_prep*1e3:.1f}ms")
