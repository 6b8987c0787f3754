"""Multi-process writer safety: concurrent -update and -remove against one
index must not corrupt it (reference tests/multiple-writers-updating.sh,
multiple-writers-removing.sh — QLockFile + transactions; here flock +
sqlite WAL)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from fixtures import synth_image


def _spawn_cli(root, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.Popen(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from cbird_tpu.cli.main import main; import sys;"
         "sys.exit(main(sys.argv[1:]))", *args],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


@pytest.mark.slow
def test_concurrent_updates(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(31)
    for i in range(12):
        Image.fromarray(synth_image(rng, 160, 200)).save(
            os.path.join(root, f"f{i:02d}.png"))

    from cbird_tpu.cli.main import main
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create"]) == 0

    # 3 concurrent updates racing over the same fresh index
    procs = [_spawn_cli(root, "-use", root, "-i.algos", "dct",
                        "-i.fsize", "16", "-update") for _ in range(3)]
    for p in procs:
        assert p.wait(timeout=600) == 0

    # index must contain each file exactly once with consistent rows
    from cbird_tpu.store.database import Database
    db = Database(root)
    media = db.all_media()
    paths = [m.path for m in media]
    assert len(paths) == len(set(paths)) == 12
    ids = [m.id for m in media]
    assert len(set(ids)) == 12
    assert all(m.dctHash for m in media)


@pytest.mark.slow
def test_concurrent_update_and_remove(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(32)
    for i in range(8):
        Image.fromarray(synth_image(rng, 160, 200)).save(
            os.path.join(root, f"g{i}.png"))
    from cbird_tpu.cli.main import main
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0

    # remove files on disk while another process re-updates
    removers = [_spawn_cli(root, "-use", root, "-remove", f"g{i}.png")
                for i in range(0, 4)]
    updater = _spawn_cli(root, "-use", root, "-i.algos", "dct",
                         "-i.fsize", "16", "-update")
    for p in removers + [updater]:
        assert p.wait(timeout=600) == 0

    # final -update reconciles: all 8 files still on disk -> re-indexed
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-update"]) == 0
    from cbird_tpu.store.database import Database
    db = Database(root)
    assert db.count() == 8
    # and the index still searches
    from cbird_tpu.params import SearchParams
    from cbird_tpu.host.engine import Engine
    eng = Engine(root)
    res = eng.db.similar(SearchParams())
    assert isinstance(res, list)
