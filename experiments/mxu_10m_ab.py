"""10M-row search_self A/B: MXU count kernel vs VPU tiles, real TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from cbird_tpu.ops.hamming import PackedHashStore

N = 10_000_000
T = 5


def main():
    rng = np.random.default_rng(11)
    hashes = rng.integers(1, 2**63, size=N, dtype=np.uint64)
    idx = rng.integers(0, N - 1, 20_000)
    flip = rng.integers(0, 64, len(idx))
    hashes[idx + 1] = hashes[idx] ^ (np.uint64(1) << flip.astype(np.uint64))
    store = PackedHashStore(hashes, np.arange(1, N + 1, dtype=np.uint32))

    hits = {}
    for mode in ("on", "on", "off"):
        os.environ["CBIRD_MXU"] = mode
        t0 = time.perf_counter()
        r = store.search_self(T)
        dt = time.perf_counter() - t0
        nh = sum(1 for ids, _ in r if len(ids))
        print(f"MXU={mode:3s}: search_self 10M in {dt:7.2f} s "
              f"({nh} rows with hits)", flush=True)
        hits.setdefault(mode, [(tuple(a), tuple(b)) for a, b in r])
    print("results identical:", hits["on"] == hits["off"])


if __name__ == "__main__":
    main()
