"""Does the axon backend overlap device compute with host work / D2H?"""
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
B = 16384
al = UnpairedAligner(idx)
b1 = make_batch(names[:B], seqs[:B], quals[:B])
b2 = make_batch(names[B:2 * B], seqs[B:2 * B], quals[B:2 * B])
al.align_batch(b1)
al.align_batch(b2)

# single dispatch+block
t0 = time.time()
h = al.collect_async(b1)
h[4][1].block_until_ready()
t1 = time.time() - t0
# two dispatches then block both
t0 = time.time()
ha = al.collect_async(b1)
hb = al.collect_async(b2)
ha[4][1].block_until_ready()
hb[4][1].block_until_ready()
t2 = time.time() - t0
print(f"1 batch: {t1*1e3:.0f}ms; 2 batches back-to-back: {t2*1e3:.0f}ms "
      f"(ratio {t2/t1:.2f} — 2.0 = serial execution, expected)")

# D2H readback cost after copy_to_host_async + device idle
h = al.collect_async(b1)
h[4][1].block_until_ready()
time.sleep(0.3)
t0 = time.time()
np.asarray(h[4][1])
print(f"asarray after block+sleep: {(time.time()-t0)*1e3:.1f}ms "
      f"(0 = async copy landed)")

# does host work overlap device compute? dispatch, do host work, then block
h0 = al.collect_async(b1)
h0[4][1].block_until_ready()
st = al.collect_wait(h0)
t0 = time.time()
h1 = al.collect_async(b2)
tm0 = time.time()
al._finish_fast(st)          # host work on previous batch
t_host = time.time() - tm0
h1[4][1].block_until_ready()
t_tot = time.time() - t0
print(f"dispatch+hostwork+block: {t_tot*1e3:.0f}ms (host work {t_host*1e3:.0f}ms"
      f"; if ~= device time alone, host overlapped)")
