"""Store-level A/B: PackedHashStore.search_self + search with/without the
MXU count path, same process, real TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from cbird_tpu.ops.hamming import PackedHashStore

N = (1 << 21) - 37  # real row count under a 2^21 bucket
T = 5


def planted_corpus(rng, n):
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    # plant ~n/500 duplicate pairs within distance T-1
    idx = rng.integers(0, n - 1, n // 500)
    flip = rng.integers(0, 64, len(idx))
    hashes[idx + 1] = hashes[idx] ^ (np.uint64(1) << flip.astype(np.uint64))
    return hashes


def canon(results):
    return [(tuple(ids), tuple(ds)) for ids, ds in results]


def main():
    rng = np.random.default_rng(11)
    hashes = planted_corpus(rng, N)
    ids = np.arange(1, N + 1, dtype=np.uint32)
    store = PackedHashStore(hashes, ids)
    needles = hashes[rng.integers(0, N, 1000)]

    runs = {}
    for mode in ("off", "on", "off", "on"):
        os.environ["CBIRD_MXU"] = mode
        t0 = time.perf_counter()
        r_self = store.search_self(T)
        t_self = time.perf_counter() - t0
        t0 = time.perf_counter()
        r_q = store.search(needles, T, min_hits=1)
        t_q = time.perf_counter() - t0
        print(f"MXU={mode:3s}: search_self {t_self:6.2f} s, "
              f"1000-needle search {t_q:6.2f} s")
        runs.setdefault(mode, (canon(r_self), canon(r_q)))

    same_self = runs["off"][0] == runs["on"][0]
    same_q = runs["off"][1] == runs["on"][1]
    print(f"results identical: self={same_self} query={same_q}")
    n_groups = sum(1 for ids_, _ in runs["on"][0] if len(ids_))
    print(f"(self-search rows with hits: {n_groups})")


if __name__ == "__main__":
    main()
