"""Pigeonhole windowed hit extraction vs full hot-needle rescan A/B.

search_self's hit phase rescans every hot needle against the whole store
(~20 s of the 27.6 s 10M total); extract_hits pulls each hot needle's
partners out of the T sorted orders instead (~T·2s candidates per needle
vs N).  This measures the full STORE-LEVEL search_self both ways in one
process and asserts the results identical.

Usage: python experiments/ph_extract_ab.py [n_millions] [threshold]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from cbird_tpu.ops.hamming import PackedHashStore
from cbird_tpu.ops import hamming


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = int(n_m * 1e6)
    rng = np.random.default_rng(7)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    n_dup = n // 1000
    src = rng.choice(n, size=n_dup, replace=False)
    dst = rng.choice(n, size=n_dup, replace=False)
    for a, b in zip(src, dst):
        h = int(hashes[a])
        for bit in rng.choice(64, size=int(rng.integers(0, t)),
                              replace=False):
            h ^= 1 << int(bit)
        hashes[b] = np.uint64(h)
    ids = np.arange(1, n + 1, dtype=np.uint32)
    store = PackedHashStore(hashes, ids)
    hamming._MESH = None  # single real chip
    import jax
    print(f"n={n} t={t} device={jax.devices()[0]}")

    runs = {}
    for mode in ("off", "off", "on", "on"):  # warm-vs-warm: 2nd of each
        os.environ["CBIRD_PH_EXTRACT"] = mode
        t0 = time.monotonic()
        res = store.search_self(t, k=64, min_n=0)
        dt = time.monotonic() - t0
        nz = sum(1 for r in res if len(r[0]))
        print(f"extract={mode}: search_self {dt:.2f}s "
              f"({nz} rows with hits)")
        runs.setdefault(mode, []).append((dt, res))

    ref = runs["off"][0][1]
    got = runs["on"][-1][1]
    bad = 0
    for i, ((ri, rd), (gi, gd)) in enumerate(zip(ref, got)):
        if not (np.array_equal(ri, gi) and np.array_equal(rd, gd)):
            if bad < 5:
                print(f"MISMATCH row {i}: off={list(ri)[:6]}/{list(rd)[:6]} "
                      f"on={list(gi)[:6]}/{list(gd)[:6]}")
            bad += 1
    print(f"results identical: {bad == 0} ({bad} mismatched rows)")


if __name__ == "__main__":
    main()
