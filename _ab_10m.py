import time, numpy as np
from cbird_tpu.ops.hamming import PackedHashStore

rng = np.random.default_rng(5)
n = 10_000_000
hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
src = rng.integers(0, n, size=40_000)
bits = rng.integers(0, 64, size=40_000).astype(np.uint64)
hashes[(src + 1) % n] = hashes[src] ^ (np.uint64(1) << bits)
store = PackedHashStore(hashes, np.arange(1, n + 1, dtype=np.uint32))

def timed(label, fn, runs=2):
    for i in range(runs):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        print(f"{label} run{i}: {dt:.1f} s, {sum(1 for x in r if len(x[0]))} matched", flush=True)

timed("tri  ", lambda: store.search_self(5, k=64))
timed("plain", lambda: store.search(hashes, 5, k=64, min_hits=2))
timed("tri  ", lambda: store.search_self(5, k=64), runs=1)
