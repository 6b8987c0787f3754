"""Q=1 hamming_topk chunk-size A/B over 10M rows (VERDICT r03 next #4).

The 2^27 single-block default was tuned at Q=1024 (topk_batch_ab.py) and
never re-measured at Q=1; bench r03 showed Q=1 device-side time grew from
~0 to 7-8 ms.  Measures p50 end-to-end latency (dispatch + readback, like
bench.py) per chunk size at Q in {1, 64}, one process, real chip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cbird_tpu.ops.hamming import hamming_topk


def main():
    print(f"device: {jax.devices()[0]}")
    N = 10_000_000
    rng = np.random.default_rng(0)
    n_pad = -(-N // (1 << 21)) * (1 << 21)
    hashes = rng.integers(1, 2**63, size=n_pad, dtype=np.uint64)
    pairs = np.zeros((n_pad, 2), dtype=np.uint32)
    pairs[:, 0] = hashes & 0xFFFFFFFF
    pairs[:, 1] = hashes >> 32
    valid = np.zeros(n_pad, dtype=bool)
    valid[:N] = True
    pairs_d = jnp.asarray(pairs)
    valid_d = jnp.asarray(valid)

    # dispatch floor for reference
    tiny = jax.jit(lambda a: a.sum())
    x8 = jnp.zeros((8, 8), jnp.float32)
    np.asarray(tiny(x8))
    floor = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(tiny(x8))
        floor.append(time.perf_counter() - t0)
    floor_ms = sorted(floor)[len(floor) // 2] * 1000
    print(f"floor: {floor_ms:.2f} ms")

    for qb in (1, 64):
        needles = jnp.asarray(pairs[:qb])
        for lgc in (21, 22, 23, 24, 27):
            chunk = 1 << lgc
            np.asarray(hamming_topk(needles, pairs_d, valid_d, k=64,
                                    chunk=chunk)[0])
            lat = []
            for _ in range(10):
                t0 = time.perf_counter()
                d, i = hamming_topk(needles, pairs_d, valid_d, k=64,
                                    chunk=chunk)
                np.asarray(d)
                lat.append(time.perf_counter() - t0)
            p50 = sorted(lat)[len(lat) // 2] * 1000
            print(f"Q={qb:3d} chunk=2^{lgc}: {p50:7.2f} ms p50 "
                  f"(~{max(p50 - floor_ms, 0):.1f} ms device)")


if __name__ == "__main__":
    main()
