"""Benchmark: DCT hash throughput + Hamming query latency on the real chip.

Prints ONE JSON line:
  {"metric": "dct_hash_images_per_sec", "value": N, "unit": "images/sec",
   "vs_baseline": N/50000}

Baseline (BASELINE.md driver targets): >=50k images hashed/sec/chip and
<10 ms p50 Hamming query over a 10M-hash index.  Secondary metrics go to
stderr so the driver's one-line contract holds.
"""

import glob
import json
import os
import sys
import time

import numpy as np


# One-line causes for >1.5x moves vs the named prior round, embedded in the
# JSON artifact so BENCH_r*.json is self-contained (VERDICT r04 #8: the r04
# artifact flagged its own 5.84x move but the explanation lived in TODO.md).
# When a big move is EXPECTED, add its in-process A/B citation here before
# the round snapshot; unexplained moves get the re-run advisory.
MOVE_EXPLANATIONS = {
    "BENCH_r03.json": (
        "round 3 shipped a 3.1x hash regression (vmap'd dynamic_update_slice "
        "edge patches in _axis_map lower to scatters); round 4 replaced them "
        "with fused one-hot corrections — same-process A/B: 245k fixed vs "
        "167k round-2 formulation vs 42k regressed "
        "(experiments/axis_map_bench_ab.py)"),
}
UNEXPLAINED = ("no recorded cause — TPU-pool speed varies up to 3x between "
               "processes; re-run to confirm, bisect if it sticks")


def _last_round_value():
    """Most recent BENCH_r*.json value, for regression-gating (VERDICT r03 #2:
    round 3 shipped a 3.1x hash loss invisibly because nothing compared
    against the prior round's number)."""
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not paths:
        return None, None
    try:
        with open(paths[-1]) as f:
            rec = json.load(f)
        if "parsed" in rec:  # driver format: {"n":…, "parsed": {…}}
            rec = rec["parsed"]
        return rec.get("value"), os.path.basename(paths[-1])
    except Exception:
        return None, None


def main():
    import jax
    import jax.numpy as jnp

    from cbird_tpu.ops.dct_hash import autocrop_boxes, dct_hash_from_boxes
    from cbird_tpu.ops.hamming import hamming_topk

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    # ---- dispatch floor: round-trip of a trivial op ------------------------
    # Under the axon tunnel a dispatch+readback costs 5-30 ms depending on
    # the TPU-pool assignment; query p50 below is bounded by this floor, not
    # by the scan itself (the full 10M-hash pass adds ~3 ms of device time).
    tiny = jax.jit(lambda a: a.sum())
    x8 = jnp.zeros((8, 8), jnp.float32)
    np.asarray(tiny(x8))
    floor = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(tiny(x8))
        floor.append(time.perf_counter() - t0)
    floor_ms = sorted(floor)[len(floor) // 2] * 1000
    print(f"dispatch floor: {floor_ms:.2f} ms round-trip for a no-op "
          f"(tunnel/pool overhead)", file=sys.stderr)

    # ---- hash throughput: 400px images, batch 256 -------------------------
    B, H, W = 512, 448, 448
    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 255, size=(B, H, W)).astype(np.uint8)
    sizes_arr = np.full((B, 2), (400, 400), dtype=np.int32)

    @jax.jit
    def hash_step(canvas, sizes):
        boxes = autocrop_boxes(canvas, sizes, 20)
        return dct_hash_from_boxes(canvas, boxes)

    cj = jnp.asarray(canvas)
    sj = jnp.asarray(sizes_arr)
    np.asarray(hash_step(cj, sj))  # compile + full sync (readback)
    iters = 64  # enough dispatches in flight to amortize the tunnel floor
    t0 = time.perf_counter()
    for _ in range(iters):
        out = hash_step(cj, sj)
    np.asarray(out)  # host readback forces real completion over the tunnel
    dt = time.perf_counter() - t0
    imgs_per_sec = B * iters / dt
    print(f"hash: {imgs_per_sec:,.0f} images/sec (B={B}, {H}x{W} canvas, "
          f"{dt / iters * 1000:.2f} ms/batch)", file=sys.stderr)

    # ---- query p50 over 10M hashes ---------------------------------------
    N = 10_000_000
    chunk = 1 << 21
    n_pad = -(-N // chunk) * chunk  # chunk-multiple bucket (10.49M)
    hashes = rng.integers(1, 2**63, size=n_pad, dtype=np.uint64)
    pairs = np.zeros((n_pad, 2), dtype=np.uint32)
    pairs[:, 0] = hashes & 0xFFFFFFFF
    pairs[:, 1] = hashes >> 32
    valid = np.zeros(n_pad, dtype=bool)
    valid[:N] = True
    pairs_d = jnp.asarray(pairs)
    valid_d = jnp.asarray(valid)

    warm_p50 = None
    for qb in (1, 64):
        needles = jnp.asarray(pairs[:qb])
        np.asarray(hamming_topk(needles, pairs_d, valid_d, k=64)[0])  # compile
        lat = []
        for _ in range(10):
            t0 = time.perf_counter()
            d, i = hamming_topk(needles, pairs_d, valid_d, k=64)
            np.asarray(d)  # full sync
            lat.append(time.perf_counter() - t0)
        p50_ms = sorted(lat)[len(lat) // 2] * 1000
        if qb == 1:
            warm_p50 = p50_ms
        print(f"query: {p50_ms:.2f} ms p50 for a {qb}-needle batch over "
              f"{N / 1e6:.0f}M hashes ({p50_ms / qb:.3f} ms/needle amortized; "
              f"~{max(p50_ms - floor_ms, 0):.1f} ms device-side after the "
              f"dispatch floor)", file=sys.stderr)

    # This IS the -serve warm path: index resident in HBM, program
    # compiled — per query one dispatch + readback.  End-to-end p50 is
    # floor-bound through the axon tunnel; on a local-chip deployment the
    # floor is sub-ms and the device-side time is the p50.
    device_ms = max(warm_p50 - floor_ms, 0.0)
    verdict = "MET" if warm_p50 < 10 else \
        ("MET excluding tunnel floor" if device_ms < 10 else "MISSED")
    print(f"serving mode (-serve) warm query p50 over 10M: "
          f"{warm_p50:.2f} ms end-to-end = {floor_ms:.1f} ms tunnel floor "
          f"+ {device_ms:.1f} ms device; <10 ms target {verdict}",
          file=sys.stderr)

    record = {
        "metric": "dct_hash_images_per_sec",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / 50000.0, 3),
    }
    last, last_name = _last_round_value()
    if last:
        ratio = imgs_per_sec / last
        record["vs_last_round"] = round(ratio, 2)
        if not (0.67 <= ratio <= 1.5):
            why = MOVE_EXPLANATIONS.get(last_name, UNEXPLAINED)
            record["vs_last_round_explained"] = why
            flag = f"  ** >1.5x move: {why} **"
        else:
            flag = ""
        print(f"vs_last_round: {ratio:.2f}x ({last_name}: {last:,.0f}){flag}",
              file=sys.stderr)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
