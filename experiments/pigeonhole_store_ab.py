"""Store-level A/B: PackedHashStore.search_self end-to-end (count phase +
hot-needle top-k + mirror completion) with the pigeonhole count phase on
vs off, same process, real TPU.  Results must be identical.

Usage: python experiments/pigeonhole_store_ab.py [n_millions] [threshold]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from cbird_tpu.ops import hamming, pigeonhole
from cbird_tpu.ops.hamming import PackedHashStore


def canon(results):
    return [(tuple(ids), tuple(ds)) for ids, ds in results]


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = int(n_m * 1e6)
    rng = np.random.default_rng(7)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    idx = rng.integers(0, n - 1, n // 500)
    flip = rng.integers(0, 64, len(idx))
    hashes[idx + 1] = hashes[idx] ^ (np.uint64(1) << flip.astype(np.uint64))
    ids = np.arange(1, n + 1, dtype=np.uint32)
    store = PackedHashStore(hashes, ids)
    hamming._MESH = None
    import jax
    print(f"n={n} t={t} device={jax.devices()[0]}")

    runs = {}
    real = pigeonhole.enabled
    for rep in range(2):
        for mode in (False, True):
            pigeonhole.enabled = (lambda m=mode: m)
            t0 = time.perf_counter()
            res = store.search_self(t, k=64, min_n=0)
            dt = time.perf_counter() - t0
            name = "pigeonhole" if mode else "classic"
            print(f"search_self {name}: {dt:.2f}s "
                  f"({'cold' if rep == 0 else 'warm'}) "
                  f"hot={sum(len(r[0]) > 0 for r in res)}")
            runs[name] = canon(res)
        if rep == 0:
            print("identical:", runs["classic"] == runs["pigeonhole"])
    print("identical:", runs["classic"] == runs["pigeonhole"])
    pigeonhole.enabled = real


if __name__ == "__main__":
    main()
