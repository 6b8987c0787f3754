"""E2E -similar at scale through the real CLI: build a synthetic index
(media rows with planted duplicate pairs written straight into media0.db),
run ``python -m cbird_tpu.cli.main -use <dir> -similar -dump`` as a
subprocess, measure wall time + child peak RSS, and verify every planted
pair lands in one output group.  Run TWICE: the first run pays the
SQL→sidecar-cache build and remote compiles, the second is the warm
number.  (The round-2 2M measurement: 177 s wall, 553 MB RSS.)

Usage: python experiments/e2e_similar_scale.py [n_millions] [n_pairs] [keep_dir]
"""

import os
import resource
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    root = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(
        prefix="e2e_similar_")
    n = int(n_m * 1e6)
    os.makedirs(root, exist_ok=True)

    from cbird_tpu.store.database import Database
    db_path = os.path.join(root, "_index", "media0.db")
    if not os.path.exists(db_path):
        rng = np.random.default_rng(11)
        hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
        srcs = rng.choice(n // 2, size=n_pairs, replace=False) * 2
        for s in srcs:
            hashes[s + 1] = hashes[s] ^ (
                np.uint64(1) << np.uint64(rng.integers(0, 64)))
        db = Database(root)
        from cbird_tpu.index.dct_hash_index import DctHashIndex
        db.add_index(DctHashIndex())
        conn = db.connect(0)
        t0 = time.perf_counter()
        signed = hashes.view(np.int64)
        chunk = 200_000
        for i in range(0, n, chunk):
            conn.executemany(
                "insert into media (id,type,path,width,height,md5,phash_dct)"
                " values (?,1,?,400,400,?,?)",
                [(j + 1, f"img{j:08d}.jpg", f"{j:032x}", int(signed[j]))
                 for j in range(i, min(i + chunk, n))])
        conn.commit()
        db.close()
        print(f"built {n}-row db with {n_pairs} planted pairs "
              f"in {time.perf_counter() - t0:.1f}s at {root}", flush=True)
        expected = {(f"img{s:08d}.jpg", f"img{s + 1:08d}.jpg") for s in srcs}
        np.save(os.path.join(root, "_pairs.npy"),
                np.array(sorted(expected), dtype=object))
    expected = {tuple(p) for p in np.load(
        os.path.join(root, "_pairs.npy"), allow_pickle=True)}

    for rep in ("cold", "warm"):
        t0 = time.perf_counter()
        env = dict(os.environ, CBIRD_PROFILE="1")
        proc = subprocess.run(
            [sys.executable, "-m", "cbird_tpu.cli.main", "-use", root,
             "-similar", "-dump"],
            capture_output=True, text=True, env=env, cwd=os.path.dirname(
                os.path.abspath(__file__)) + "/..")
        dt = time.perf_counter() - t0
        for line in proc.stderr.splitlines():
            if "[profile]" in line:
                print(f"  {rep} {line[line.index('[profile]'):]}", flush=True)
        rss_mb = resource.getrusage(
            resource.RUSAGE_CHILDREN).ru_maxrss / 1024
        if proc.returncode:
            print(proc.stdout[-2000:], proc.stderr[-4000:])
            sys.exit(1)
        groups, members = 0, []
        found = set()
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("=== group"):
                for a in members:
                    for b in members:
                        if (a, b) in expected:
                            found.add((a, b))
                groups += 1
                members = []
            elif line.startswith(("needle: ", "match: ")):
                members.append(os.path.basename(line.split(" ", 1)[1]
                                                .split(" score=")[0]))
        for a in members:
            for b in members:
                if (a, b) in expected:
                    found.add((a, b))
        print(f"-similar -dump ({rep}): {dt:.1f}s wall, "
              f"child peak RSS {rss_mb:.0f} MB, {groups} groups, "
              f"recall {len(found)}/{len(expected)} planted pairs",
              flush=True)


if __name__ == "__main__":
    main()
