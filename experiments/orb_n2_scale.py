"""orb N² artifact (VERDICT r04 #6): wide-batch `find_batch` over EVERY
image of a 50k-image synthetic descriptor store — the `-p.alg orb -similar`
work pattern at 50x the reference's published 1k scale (9 s for 1k images,
/root/reference/readme.md:253; knn voting has no distance threshold to
count-gate on, so orb N² stays per-needle by structure — the reference
DNFs beyond small stores for the same reason).

Store: n_images × desc_per_image random 256-bit descriptors; planted
duplicate pairs copy the source image's descriptors with ≤8 flipped bits
per descriptor (inside the default cvThresh=25 knn accept window).
Measures wall + recall/precision over the planted pairs with the default
vote gate.

Usage: python experiments/orb_n2_scale.py [n_images] [desc_per_image] [pairs]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dpi = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    from cbird_tpu.index.cv_features_index import CvFeaturesIndex
    from cbird_tpu.params import SearchParams
    from cbird_tpu.store.media import Media

    rng = np.random.default_rng(5)
    desc = rng.integers(0, 2**32, size=(n_images * dpi, 8), dtype=np.uint32)
    ids = np.repeat(np.arange(1, n_images + 1, dtype=np.uint32), dpi)
    srcs = rng.choice(n_images // 2, size=n_pairs, replace=False) * 2
    for s in srcs:  # image s+2 duplicates image s+1 (ids are 1-based)
        src_rows = slice(s * dpi, (s + 1) * dpi)
        dst_rows = slice((s + 1) * dpi, (s + 2) * dpi)
        d = desc[src_rows].copy()
        for r in range(dpi):  # flip ≤8 of 256 bits per descriptor
            for b in rng.integers(0, 256, size=int(rng.integers(2, 9))):
                d[r, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
        desc[dst_rows] = d
    expected = {(int(s) + 1, int(s) + 2) for s in srcs}

    idx = CvFeaturesIndex()
    idx._store.add(desc, ids)
    idx._loaded = True

    params = SearchParams()
    params.set_param("alg", "orb")
    params.maxMatches = 10

    needles = [Media(f"img{i}.jpg", 1, 400, 400, f"{i:032x}", id=i)
               for i in range(1, n_images + 1)]
    qb = 256  # images per find_batch call (256*dpi needle descriptors)
    t0 = time.perf_counter()
    found = set()
    got_pairs = 0
    for s in range(0, n_images, qb):
        batch = needles[s:s + qb]
        res = idx.find_batch(batch, params)
        for n, matches in zip(batch, res):
            for m in matches:
                if m.mediaId != n.id:
                    got_pairs += 1
                    key = (min(n.id, m.mediaId), max(n.id, m.mediaId))
                    if key in expected:
                        found.add(key)
        if (s // qb) % 20 == 0:
            print(f"  {s + len(batch)}/{n_images} needles, "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
    dt = time.perf_counter() - t0
    # every planted pair reports from both sides; precision counts directed
    # reports that belong to a planted pair
    prec = 2 * len(found) / max(got_pairs, 1)
    print(f"orb N2: {n_images / 1e3:.0f}k images x {dpi} desc "
          f"({n_images * dpi / 1e6:.1f}M descriptors) in {dt:.1f}s "
          f"({dt / n_images * 1e3:.2f} ms/needle-image; reference: 9 s for "
          f"1k images); recall {len(found)}/{n_pairs} planted pairs, "
          f"precision {prec:.3f}", flush=True)


if __name__ == "__main__":
    main()
