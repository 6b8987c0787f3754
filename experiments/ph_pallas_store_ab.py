"""Store-level A/B: search_self with the pigeonhole count phase, Pallas
band kernel vs XLA band chunks, same process, real TPU.  Results must be
identical.

Usage: python experiments/ph_pallas_store_ab.py [n_millions] [threshold]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from cbird_tpu.ops import hamming
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
    for rep in range(2):
        for mode in ("off", "on"):
            os.environ["CBIRD_PALLAS_BAND"] = mode
            t0 = time.perf_counter()
            res = store.search_self(t, k=64, min_n=0)
            dt = time.perf_counter() - t0
            name = f"band={mode}"
            print(f"search_self {name}: {dt:.2f}s "
                  f"({'cold' if rep == 0 else 'warm'}) "
                  f"hot={sum(len(r[0]) > 0 for r in res)}", flush=True)
            runs[name] = canon(res)
        print("identical:", runs["band=off"] == runs["band=on"], flush=True)
    del os.environ["CBIRD_PALLAS_BAND"]


if __name__ == "__main__":
    main()
