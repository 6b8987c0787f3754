"""Per-algo precision/recall on the photographic-statistics corpus.

Usage:
  python accuracy.py [--bases N] [--root DIR] [--algos dct,fdct,orb,color]

Builds (or reuses) an N-base corpus with the reference-style variant set
(5 scales + JPEG-q50 + crop + 5° rotation + letterbox + mirror;
tests/corpus.py), indexes it once with every requested algo, then runs the
-test-csv machinery per algo: each variant queried as a needle, truth =
its base's files.  Numbers go to PARITY.md; tests/test_accuracy.py gates
CI on them with a smaller corpus.  Reference harness equivalent:
/root/reference/unit/testindexbase.cpp:121-123 (40 photos × 5 sizes).
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time


def _algo_params(algo: str, max_matches: int = 10):
    from cbird_tpu.params import SearchParams
    p = SearchParams()
    p.set_param("alg", algo)
    if algo == "dct":
        p.set_param("dht", "7")
    elif algo == "fdct":
        p.set_param("dht", "7")
    elif algo == "orb":
        p.set_param("odt", "25")
    p.maxMatches = max_matches
    return p


def run_accuracy(root: str, n_base: int = 40,
                 algos: tuple[str, ...] = ("dct", "fdct", "orb", "color"),
                 mirror_dct: bool = True, seed: int = 7,
                 adversarial: bool = False, ovg_ab: bool = False) -> dict:
    """Index the corpus at ``root`` (built if missing) and measure per-algo
    precision/recall.  @return {algo: {"recall": r, "precision": p, ...}}

    @param seed corpus generator seed — gate constants (orb cvGate /
           GATE_FLOOR) were tuned on seed=7; pass a DIFFERENT seed for a
           held-out evaluation (VERDICT r04 #5)
    @param adversarial add the rot90/rot180/wmark/chain variants plus a
           'cousin' hard negative per base (shared 1/f skeleton, different
           content — indexed, in no truth set); per-algo stats then carry
           ``cousin_fp_rows``: needle rows whose matches included ANY
           cousin (false positives against the planted negatives)
    @param ovg_ab additionally measure orb with the vote gate disabled
           (-p.ovg 0, the reference's exact voting) as 'orb(ovg=0)'"""
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(repo, "tests"))
    # reuse the test tier's persistent XLA cache (the ORB pyramid costs
    # ~3 min to compile on one CPU core)
    cache = os.environ.get("CBIRD_COMPILE_CACHE",
                           os.path.join(repo, "tests", ".jax_cache"))
    # CBIRD_PLATFORM=cpu forces the CPU backend even when a site hook pins
    # jax_platforms at interpreter start (same contract as the CLI)
    plat = os.environ.get("CBIRD_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    if cache != "off":
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from corpus import (ADVERSARIAL, EXPECTED_VARIANTS, make_photo_corpus)

    from cbird_tpu.cli.main import main as cli
    from cbird_tpu.cli.testcsv import run_test_csv
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams

    tag = f"{n_base}-s{seed}" + ("-adv" if adversarial else "")
    marker = os.path.join(root, f".corpus-{tag}")
    if not os.path.exists(marker):
        t0 = time.time()
        variants = ("scales", "q50", "crop", "rot5", "letterbox", "mirror")
        if adversarial:
            variants = variants + ADVERSARIAL
        files = make_photo_corpus(root, n_base=n_base, seed=seed,
                                  variants=variants)
        with open(marker, "w") as f:
            json.dump({k: {t: os.path.basename(p) for t, p in v.items()}
                       for k, v in files.items()}, f)
        print(f"corpus: {n_base} bases built in {time.time() - t0:.0f}s",
              file=sys.stderr)
    with open(marker) as f:
        files = json.load(f)

    algo_mask = 0
    bits = {"dct": 1, "fdct": 2, "orb": 4, "color": 8}
    for a in algos:
        algo_mask |= bits[a]
    t0 = time.time()
    rc = cli(["-use", root, "-i.algos", str(algo_mask), "-i.fsize", "16",
              "-create", "-update"])
    assert rc == 0, "indexing failed"
    print(f"index: updated in {time.time() - t0:.0f}s", file=sys.stderr)

    def _cousin_fp_rows(csv_path: str) -> int:
        """Rows of match.csv whose found-set includes any planted cousin
        negative (the adversarial false-positive metric)."""
        mp = os.path.join(os.path.dirname(os.path.abspath(csv_path)),
                          "match.csv")
        n = 0
        with open(mp, newline="") as f:
            rd = csv.reader(f)
            next(rd, None)
            for row in rd:
                if len(row) >= 3 and "_cousin.jpg" in row[2]:
                    n += 1
        return n

    # adversarial corpora carry ~15 same-base variants competing for the 10
    # match slots, so the specific must-find orig can be crowded out by
    # closer siblings; a row then passes when ANY same-base sibling is
    # retrieved (the dedup contract is finding the duplicate CLUSTER).
    # maxMatches stays 10: widening it would let the top-k color scan
    # (which has no distance gate, like the reference) fill the extra
    # slots with junk and corrupt the precision/negative metrics.
    mm = 10

    def _measure(key: str, params, csv_path: str, truth) -> None:
        t0 = time.time()
        stats = run_test_csv(eng, params, csv_path, truth=truth,
                             any_of=adversarial)
        stats["seconds"] = round(time.time() - t0, 1)
        if adversarial:
            stats["cousin_fp_rows"] = _cousin_fp_rows(csv_path)
        results[key] = stats

    eng = Engine(root, IndexParams())
    results: dict = {}
    try:
        for algo in algos:
            csv_path = os.path.join(root, f"acc-{algo}.csv")
            truth: dict[str, set[str]] = {}
            with open(csv_path, "w", newline="") as f:
                w = csv.writer(f)
                for base, variants in files.items():
                    # the cousin is the planted NEGATIVE: never acceptable
                    names = {v for t, v in variants.items() if t != "cousin"}
                    for tag in EXPECTED_VARIANTS[algo]:
                        if tag not in variants:
                            continue
                        w.writerow([variants[tag], variants["orig"]])
                        truth[variants[tag]] = names
            _measure(algo, _algo_params(algo, mm), csv_path, truth)
            if algo == "orb" and ovg_ab:
                # reference-exact voting (no relative vote gate): the
                # -p.ovg default-on deviation measured on the same split
                p = _algo_params("orb", mm)
                p.set_param("ovg", "0")
                _measure("orb(ovg=0)", p, csv_path, truth)
        if mirror_dct and "dct" in algos:
            # mirror variants must come back once -p.refl searches flips
            p = _algo_params("dct", mm)
            p.set_param("refl", "h")
            csv_path = os.path.join(root, "acc-dct-mirror.csv")
            truth = {}
            with open(csv_path, "w", newline="") as f:
                w = csv.writer(f)
                for base, variants in files.items():
                    if "mirror" in variants:
                        w.writerow([variants["mirror"], variants["orig"]])
                        truth[variants["mirror"]] = {
                            v for t, v in variants.items() if t != "cousin"}
            _measure("dct+refl(mirror)", p, csv_path, truth)
        if adversarial and "dct" in algos:
            # 180° rotation == horizontal+vertical mirror: -p.refl b
            # recovers it with the plain dct hash
            p = _algo_params("dct", mm)
            p.set_param("refl", "b")
            csv_path = os.path.join(root, "acc-dct-rot180.csv")
            truth = {}
            with open(csv_path, "w", newline="") as f:
                w = csv.writer(f)
                for base, variants in files.items():
                    if "rot180" in variants:
                        w.writerow([variants["rot180"], variants["orig"]])
                        truth[variants["rot180"]] = {
                            v for t, v in variants.items() if t != "cousin"}
            _measure("dct+refl(rot180)", p, csv_path, truth)
    finally:
        eng.db.close()
    return results


def run_video_accuracy(root: str, n_base: int = 12, n_frames: int = 150
                       ) -> dict:
    """Video-algo recall/precision: every variant clip queried as a video
    needle, truth = its base's files (reference harness equivalent:
    /root/reference/unit/testvideoindex.cpp:31 — xiph clips; no network
    here, so photo-statistics pans from tests/corpus.make_video_corpus).
    @return {"recall": r, "precision": p, "rows": n, "seconds": s}"""
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(repo, "tests"))
    from corpus import VIDEO_VARIANTS, make_video_corpus

    from cbird_tpu.cli.main import main as cli
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams, SearchParams

    marker = os.path.join(root, f".vcorpus-{n_base}")
    if not os.path.exists(marker):
        t0 = time.time()
        files = make_video_corpus(root, n_base=n_base, n_frames=n_frames)
        with open(marker, "w") as f:
            json.dump(files, f)
        print(f"video corpus: {n_base} bases x {n_frames} frames built in "
              f"{time.time() - t0:.0f}s", file=sys.stderr)
    with open(marker) as f:
        files = json.load(f)

    t0 = time.time()
    rc = cli(["-use", root, "-i.algos", "16", "-i.fsize", "16",
              "-create", "-update"])
    assert rc == 0, "video indexing failed"
    print(f"video index: updated in {time.time() - t0:.0f}s", file=sys.stderr)

    sp = SearchParams()
    sp.set_param("alg", "video")
    sp.skipFrames = 5         # corpus clips are ~6 s; default 300 is for
    sp.minFramesMatched = 10  # feature films (reference index.h defaults)
    eng = Engine(root, IndexParams())
    found = correct = false_pos = rows = 0
    t0 = time.time()
    try:
        for base, variants in files.items():
            truth = set(variants.values())
            for tag in VIDEO_VARIANTS:
                needle = eng.db.media_with_path(variants[tag])
                # media_with_path returns an EMPTY Media for unknown paths
                assert needle.is_valid(), f"not indexed: {variants[tag]}"
                matches = eng.db.similar_to(needle, sp)
                names = {m.path for m in matches}
                rows += 1
                if variants["orig"] in names:
                    found += 1
                correct += len(names & truth)  # same-base siblings all count
                false_pos += len(names - truth)
    finally:
        eng.db.close()
    return {"recall": found / max(rows, 1),
            "precision": correct / max(correct + false_pos, 1),
            "rows": rows, "seconds": round(time.time() - t0, 1)}


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=40)
    ap.add_argument("--root", default="/tmp/cbird_accuracy")
    ap.add_argument("--algos", default="dct,fdct,orb,color,video")
    ap.add_argument("--video-bases", type=int, default=12)
    ap.add_argument("--seed", type=int, default=7,
                    help="corpus seed; gate constants were tuned on 7 — "
                         "use a different seed for a held-out evaluation")
    ap.add_argument("--adversarial", action="store_true",
                    help="add rot90/rot180/wmark/chain variants + cousin "
                         "hard negatives")
    ap.add_argument("--ovg-ab", action="store_true",
                    help="also measure orb with -p.ovg 0 (reference-exact "
                         "voting)")
    args = ap.parse_args(argv)
    algos = tuple(args.algos.split(","))
    image_algos = tuple(a for a in algos if a != "video")
    res = run_accuracy(args.root, args.bases, image_algos,
                       seed=args.seed, adversarial=args.adversarial,
                       ovg_ab=args.ovg_ab) if image_algos else {}
    if "video" in algos:
        res["video"] = run_video_accuracy(
            os.path.join(args.root, "video"), args.video_bases)
    print(f"{'algo':<18} {'recall':>7} {'precision':>9} {'rows':>5} "
          f"{'neg-fp':>6} {'sec':>6}")
    for algo, s in res.items():
        nfp = s.get("cousin_fp_rows", "-")
        print(f"{algo:<18} {s['recall']:>7.3f} {s['precision']:>9.3f} "
              f"{s['rows']:>5} {nfp!s:>6} {s['seconds']:>6}")
    print(json.dumps({a: {"recall": round(s["recall"], 3),
                          "precision": round(s["precision"], 3),
                          **({"cousin_fp_rows": s["cousin_fp_rows"]}
                             if "cousin_fp_rows" in s else {})}
                      for a, s in res.items()}))


if __name__ == "__main__":
    main()
