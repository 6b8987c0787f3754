import time, numpy as np
from cbird_tpu.ops.hamming import PackedHashStore

rng = np.random.default_rng(5)
n = 2_000_000
hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
for j in range(8000):
    src = rng.integers(0, n)
    hashes[(src + 1) % n] = np.uint64(int(hashes[src]) ^ (1 << int(rng.integers(0, 64))))
ids = np.arange(1, n + 1, dtype=np.uint32)
store = PackedHashStore(hashes, ids)

def timed(label, fn, warm=1, runs=2):
    for i in range(warm):
        fn()
    for i in range(runs):
        t0 = time.perf_counter(); r = fn(); dt = time.perf_counter() - t0
        print(f"{label} run{i}: {dt:.2f} s, {sum(1 for x in r if len(x[0]))} matched", flush=True)

timed("plain        ", lambda: store.search(hashes, 5, k=64, min_hits=2))
for rows, cols in [(16384, 1 << 16), (16384, 1 << 17), (16384, 1 << 18),
                   (32768, 1 << 17), (32768, 1 << 18)]:
    timed(f"tri r{rows//1024}k c{cols//1024}k",
          lambda rows=rows, cols=cols: store.search_self(5, k=64, rows=rows, cols=cols))
timed("plain        ", lambda: store.search(hashes, 5, k=64, min_hits=2))
