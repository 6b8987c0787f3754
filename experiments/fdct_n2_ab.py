"""fdct N² A/B: DctFeaturesIndex.find_all (search_self on the kp-hash
store + per-hot-image voting) vs the per-needle find_batch path, same
process, real TPU.  Groups must be identical.

Usage: python experiments/fdct_n2_ab.py [n_images_k] [hashes_per_image]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from cbird_tpu.index.dct_features_index import DctFeaturesIndex
from cbird_tpu.params import SearchParams
from cbird_tpu.store.media import Media


def main():
    n_img = int(float(sys.argv[1] if len(sys.argv) > 1 else 200) * 1000)
    hpi = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rng = np.random.default_rng(7)
    n = n_img * hpi
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    ids = np.repeat(np.arange(1, n_img + 1, dtype=np.uint32), hpi)
    # plant duplicate images: image d copies image s's hashes +- a few bits
    srcs = rng.choice(n_img - 1, size=n_img // 500, replace=False)
    for s in srcs:
        d = s + 1
        for j in range(hpi):
            flip = np.uint64(1) << np.uint64(rng.integers(0, 64))
            hashes[d * hpi + j] = hashes[s * hpi + j] ^ (
                flip if rng.random() < 0.7 else np.uint64(0))
    index = DctFeaturesIndex()
    index._store.add(hashes, ids)
    index._loaded = True
    sp = SearchParams()
    sp.set_param("alg", "fdct")
    import jax
    print(f"images={n_img} kp_hashes={n} t={sp.dctThresh} "
          f"device={jax.devices()[0]}", flush=True)

    for rep in ("cold", "warm"):
        t0 = time.perf_counter()
        out_ids, raw = index.find_all(sp)
        dt_fast = time.perf_counter() - t0
        print(f"find_all ({rep}): {dt_fast:.2f}s, "
              f"{len(out_ids)} images with hits", flush=True)

    fast = {int(m): {(int(i), int(s)) for i, s in zip(*r) if i != m}
            for m, r in zip(out_ids, raw)}
    fast = {m: v for m, v in fast.items() if v}

    needles = [Media(id=int(m)) for m in np.unique(ids)]
    for rep in ("cold", "warm"):
        t0 = time.perf_counter()
        batches = index.find_batch(needles, sp)
        dt_slow = time.perf_counter() - t0
        print(f"find_batch ({rep}): {dt_slow:.2f}s", flush=True)
    slow = {}
    for nd, ms in zip(needles, batches):
        v = {(m.mediaId, m.score) for m in ms if m.mediaId != nd.id}
        if v:
            slow[nd.id] = v
    print(f"identical: {fast == slow} "
          f"({len(fast)} vs {len(slow)} hit images); "
          f"speedup {dt_slow / dt_fast:.1f}x", flush=True)


if __name__ == "__main__":
    main()
