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


def _algo_params(algo: str):
    from cbird_tpu.params import SearchParams
    p = SearchParams()
    p.set_param("alg", algo)
    if algo == "dct":
        p.set_param("dht", "7")
    elif algo == "fdct":
        p.set_param("dht", "7")
    elif algo == "orb":
        p.set_param("odt", "25")
    p.maxMatches = 10
    return p


def run_accuracy(root: str, n_base: int = 40,
                 algos: tuple[str, ...] = ("dct", "fdct", "orb", "color"),
                 mirror_dct: bool = True) -> dict:
    """Index the corpus at ``root`` (built if missing) and measure per-algo
    precision/recall.  @return {algo: {"recall": r, "precision": p, ...}}"""
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
    from corpus import EXPECTED_VARIANTS, make_photo_corpus

    from cbird_tpu.cli.main import main as cli
    from cbird_tpu.cli.testcsv import run_test_csv
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams

    marker = os.path.join(root, f".corpus-{n_base}")
    if not os.path.exists(marker):
        t0 = time.time()
        files = make_photo_corpus(root, n_base=n_base)
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

    eng = Engine(root, IndexParams())
    results: dict = {}
    try:
        for algo in algos:
            csv_path = os.path.join(root, f"acc-{algo}.csv")
            truth: dict[str, set[str]] = {}
            with open(csv_path, "w", newline="") as f:
                w = csv.writer(f)
                for base, variants in files.items():
                    names = set(variants.values())
                    for tag in EXPECTED_VARIANTS[algo]:
                        if tag not in variants:
                            continue
                        w.writerow([variants[tag], variants["orig"]])
                        truth[variants[tag]] = names
            t0 = time.time()
            stats = run_test_csv(eng, _algo_params(algo), csv_path,
                                 truth=truth)
            stats["seconds"] = round(time.time() - t0, 1)
            results[algo] = stats
        if mirror_dct and "dct" in algos:
            # mirror variants must come back once -p.refl searches flips
            p = _algo_params("dct")
            p.set_param("refl", "h")
            csv_path = os.path.join(root, "acc-dct-mirror.csv")
            truth = {}
            with open(csv_path, "w", newline="") as f:
                w = csv.writer(f)
                for base, variants in files.items():
                    if "mirror" in variants:
                        w.writerow([variants["mirror"], variants["orig"]])
                        truth[variants["mirror"]] = set(variants.values())
            t0 = time.time()
            stats = run_test_csv(eng, p, csv_path, truth=truth)
            stats["seconds"] = round(time.time() - t0, 1)
            results["dct+refl(mirror)"] = stats
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
    args = ap.parse_args(argv)
    algos = tuple(args.algos.split(","))
    image_algos = tuple(a for a in algos if a != "video")
    res = run_accuracy(args.root, args.bases, image_algos) \
        if image_algos else {}
    if "video" in algos:
        res["video"] = run_video_accuracy(
            os.path.join(args.root, "video"), args.video_bases)
    print(f"{'algo':<18} {'recall':>7} {'precision':>9} {'rows':>5} {'sec':>6}")
    for algo, s in res.items():
        print(f"{algo:<18} {s['recall']:>7.3f} {s['precision']:>9.3f} "
              f"{s['rows']:>5} {s['seconds']:>6}")
    print(json.dumps({a: {"recall": round(s["recall"], 3),
                          "precision": round(s["precision"], 3)}
                      for a, s in res.items()}))


if __name__ == "__main__":
    main()
