"""ORB vote-gate design data (VERDICT r03 #7): per-match score vs truth.

Loads the accuracy corpus engine (built by `accuracy.py --algos orb
--root DIR`), queries every orb needle, and prints per-needle match lists
annotated with same-base truth, so the trailing-vote gate (score gap /
absolute distance) can be chosen from data instead of guesswork.

Usage: CBIRD_PLATFORM=cpu python experiments/orb_vote_gate.py /tmp/acc_orb
"""

import collections
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/acc_orb"
    plat = os.environ.get("CBIRD_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams, SearchParams

    params = IndexParams()
    params.algos = 0b1111
    eng = Engine(root, params)
    sp = SearchParams()
    sp.set_param("alg", "orb")
    sp.set_param("odt", "25")
    sp.maxMatches = 10

    media = eng.db.media_with_type(1)  # images
    base = lambda p: os.path.basename(p).split("_")[0]
    needles = [m for m in media
               if os.path.basename(m.path).split("_", 1)[-1].split(".")[0]
               in ("s025", "s033", "s050", "s075", "q50", "crop", "rot5")]
    idx = next(i for i in eng.db.indexes() if i.id == SearchParams.ALGO_CV_FEATURES)
    eng.db.load_index(sp)

    all_matches = idx.find_batch(needles, sp)
    by_id = {m.id: m for m in media}
    gap_stats = []          # (score ratio to previous, is_junk)
    rank_stats = collections.Counter()
    for n, matches in zip(needles, all_matches):
        matches = sorted(matches, key=lambda m: m.score)
        nb = base(n.path)
        row = []
        prev = None
        for r, mt in enumerate(matches):
            if mt.mediaId == n.id:
                continue
            tgt = by_id.get(mt.mediaId)
            junk = tgt is None or base(tgt.path) != nb
            row.append((mt.score, junk))
            if junk:
                rank_stats[len(row) - 1] += 1
            if prev is not None:
                gap_stats.append((mt.score, prev, junk))
            prev = mt.score
        print(n.path.split("/")[-1],
              " ".join(f"{'J' if j else 't'}{s}" for s, j in row))
    print("\njunk rank histogram (0 = best non-self):", dict(rank_stats))
    true_gaps = [(s, p) for s, p, j in gap_stats if not j]
    junk_gaps = [(s, p) for s, p, j in gap_stats if j]
    if true_gaps:
        r = [s / max(p, 1) for s, p in true_gaps]
        print(f"true-match step ratio: p50 {np.median(r):.2f} "
              f"max {max(r):.2f} (n={len(r)})")
        print(f"true-match abs score: max {max(s for s, _ in true_gaps)}")
    if junk_gaps:
        r = [s / max(p, 1) for s, p in junk_gaps]
        print(f"junk step ratio: min {min(r):.2f} p50 {np.median(r):.2f} "
              f"(n={len(r)})")
        print(f"junk abs score: min {min(s for s, _ in junk_gaps)}")
    eng.db.close()


if __name__ == "__main__":
    main()
