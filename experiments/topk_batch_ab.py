"""Hot-needle rescan batch-width / chunk-width A/B.

search_self's top-k rescan dispatches hamming_topk in needle_batch=1024
slices over 2^21-row streaming chunks; at 10M/t=5 it is now the largest
stage (~4.3 s for 10k hot needles after the count-phase work landed).
This sweeps the two shape knobs in ONE process (pool speed varies 3x
between processes).

Usage: python experiments/topk_batch_ab.py [n_millions] [n_hot]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax.numpy as jnp

from cbird_tpu.ops.hamming import hamming_topk
from cbird_tpu.ops.dct_hash import split_u64


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 10240
    n = int(n_m * 1e6)
    rng = np.random.default_rng(7)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    n_pad = -n % (1 << 21)
    pairs = jnp.asarray(np.pad(split_u64(hashes), ((0, n_pad), (0, 0))))
    valid = jnp.asarray(np.pad(np.ones(n, bool), (0, n_pad)))
    hot = np.sort(rng.choice(n, size=n_hot, replace=False))
    needles = split_u64(hashes[hot])
    import jax
    print(f"n={n} hot={n_hot} device={jax.devices()[0]}")

    for qb in (1024, 2048, 4096):
        for chunk in (1 << 21, 1 << 22):
            for it in range(2):  # 2nd iteration is the warm number
                t0 = time.monotonic()
                outs = []
                for s in range(0, n_hot, qb):
                    nb = needles[s:s + qb]
                    if nb.shape[0] < qb:
                        nb = np.pad(nb, ((0, qb - nb.shape[0]), (0, 0)))
                    outs.append(hamming_topk(jnp.asarray(nb), pairs, valid,
                                             k=64, chunk=chunk,
                                             recall=0.999))
                got = [(np.asarray(d), np.asarray(i)) for d, i in outs]
                dt = time.monotonic() - t0
            nz = sum(int((d < 5).sum()) for d, _ in got)
            print(f"qb={qb} chunk=2^{chunk.bit_length()-1}: {dt:.3f}s warm "
                  f"({nz} sub-5 hits)")


if __name__ == "__main__":
    main()
