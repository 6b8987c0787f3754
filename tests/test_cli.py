"""CLI surface: positional order-sensitive interpreter, cbird verbs + params
(reference src/main.cpp:612-1839)."""

import json
import os

import pytest

from cbird_tpu.cli.main import Cli, main

from fixtures import make_corpus


@pytest.fixture(scope="module")
def indexed_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_corpus"))
    groups = make_corpus(root, n_base=4, scales=(1.0, 0.5))
    rc = main(["-use", root, "-i.algos", "dct", "-i.fsize", "128",
               "-create", "-update"])
    assert rc == 0
    return root, groups


def test_help_and_version(capsys):
    assert main(["-help"]) == 0
    out = capsys.readouterr().out
    assert "-similar" in out and "-update" in out
    assert main(["-version"]) == 0


def test_list_params(capsys):
    assert main(["-list-params"]) == 0
    out = capsys.readouterr().out
    assert "dht" in out
    assert main(["-list-index-params"]) == 0
    out = capsys.readouterr().out
    assert "rsize" in out


def test_unknown_arg():
    assert main(["-bogus"]) == 2


def test_missing_value():
    assert main(["-p.dht"]) == 2


def test_similar_dump(indexed_corpus, capsys):
    root, groups = indexed_corpus
    rc = main(["-use", root, "-similar", "-dump"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "=== group" in out
    assert "needle:" in out and "match:" in out


def test_similar_json(indexed_corpus, capsys):
    root, groups = indexed_corpus
    rc = main(["-use", root, "-similar", "-json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data
    for g in data:
        assert "needle" in g and "matches" in g
        assert g["needle"]["md5"]
        assert g["needle"]["dctHash"]
        for m in g["matches"]:
            assert "score" in m


def test_similar_to(indexed_corpus, capsys):
    root, groups = indexed_corpus
    needle = groups["img000"][0]
    rc = main(["-use", root, "-similar-to", needle, "-json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert len(data) == 1
    paths = [m["path"] for m in data[0]["matches"]]
    assert groups["img000"][1] in paths


def test_p_path_scopes_matches(tmp_path, capsys):
    """-p.path / -p.inpath scope match results by subtree
    (Database::filterMatch path filter, src/database.cpp:1209-1247)."""
    root = str(tmp_path)
    sub = os.path.join(root, "sub")
    make_corpus(root, n_base=2, scales=(1.0,))
    os.makedirs(sub)
    make_corpus(sub, n_base=2, scales=(0.5,))  # rescaled copies in sub/
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "128",
                 "-create", "-update"]) == 0
    assert main(["-use", root, "-p.dht", "8", "-p.inpath", "true",
                 "-p.path", "sub", "-similar", "-json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data
    for g in data:
        for m in g["matches"]:
            assert "/sub/" in m["path"], m["path"]
    assert main(["-use", root, "-p.dht", "8",
                 "-p.path", "sub", "-similar", "-json"]) == 0
    data = json.loads(capsys.readouterr().out)
    for g in data:
        for m in g["matches"]:
            assert "/sub/" not in m["path"], m["path"]


def test_param_ordering_matters(indexed_corpus, capsys):
    """-p.dht 0 disables matches when set before -similar."""
    root, groups = indexed_corpus
    rc = main(["-use", root, "-p.dht", "1", "-similar", "-count"])
    assert rc == 0
    out1 = capsys.readouterr().out
    rc = main(["-use", root, "-p.dht", "12", "-similar", "-count"])
    out2 = capsys.readouterr().out
    n1 = int(out1.split()[0])
    n2 = int(out2.split()[0])
    assert n2 >= n1


def test_select_and_group_by(indexed_corpus, capsys):
    root, groups = indexed_corpus
    rc = main(["-use", root, "-select-all", "-group-by", "suffix", "-count"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("1 groups")  # all png


def test_head_sort(indexed_corpus, capsys):
    root, groups = indexed_corpus
    rc = main(["-use", root, "-similar", "-sort", "path", "-head", "2",
               "-count"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("2 groups")


def test_verify_clean(indexed_corpus, capsys):
    root, _ = indexed_corpus
    assert main(["-use", root, "-verify"]) == 0


def test_about(indexed_corpus, capsys):
    root, _ = indexed_corpus
    assert main(["-use", root, "-about"]) == 0
    out = capsys.readouterr().out
    assert "cbird-tpu" in out and "items:" in out


def test_no_index_error(tmp_path):
    with pytest.raises(SystemExit):
        main(["-use", str(tmp_path), "-similar"])


def test_args_file(indexed_corpus, tmp_path, capsys):
    root, _ = indexed_corpus
    f = tmp_path / "saved.txt"
    f.write_text("-p.dht 9\n# comment\n-similar\n-count\n")
    rc = main(["-use", root, "-args", str(f)])
    assert rc == 0
    assert "groups" in capsys.readouterr().out


def test_similar_to_directory(indexed_corpus, tmp_path, capsys):
    """-similar-to <dir> queries every indexed file under the directory."""
    root, groups = indexed_corpus
    rc = main(["-use", root, "-similar-to", root, "-count"])
    assert rc == 0
    out = capsys.readouterr().out
    n_groups = int(out.split()[0])
    assert n_groups >= len(groups)  # every base image pairs with its variant


def test_updatemd5(tmp_path, capsys):
    """-updatemd5 upgrades a legacy sparse video md5 to the full md5, and
    leaves rows already carrying a full md5 alone (reference
    src/main.cpp:1735-1752)."""
    import numpy as np

    from cbird_tpu.host.video import FseqBackend
    from cbird_tpu.store.database import Database
    from cbird_tpu.store.ioutil import full_md5_file, sparse_md5_file

    root = str(tmp_path)
    rng = np.random.default_rng(7)
    for name in ("a", "b"):
        frames = rng.integers(0, 255, size=(12, 64, 80), dtype=np.uint8)
        FseqBackend.save(os.path.join(root, f"{name}.fseq"), frames, 25.0)
    assert main(["-use", root, "-i.algos", "dct+video", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    pa = os.path.join(root, "a.fseq")
    db = Database(root)
    ma = db.media_with_path(pa)
    assert ma.id and ma.md5 == full_md5_file(pa)  # indexed with full md5
    assert db.set_md5(ma, sparse_md5_file(pa))  # simulate a legacy row

    assert main(["-use", root, "-select-type", "v", "-updatemd5"]) == 0
    out = capsys.readouterr()
    assert "1 updated, 1 skipped" in out.out + out.err
    db2 = Database(root)
    assert db2.media_with_path(pa).md5 == full_md5_file(pa)
    # a second pass finds nothing sparse: both rows skipped
    assert main(["-use", root, "-select-type", "v", "-updatemd5"]) == 0
    out = capsys.readouterr()
    assert "0 updated" in out.out + out.err


def test_test_update_verb(tmp_path, capsys):
    """-test-update: scripted start/stop/finish cycle ends with a stable,
    fully-indexed database (headless stand-in for the reference's
    interactive harness, src/commands.cpp:1130-1172)."""
    from fixtures import make_corpus

    root = str(tmp_path)
    make_corpus(root, n_base=4, scales=(1.0, 0.5))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "128",
                 "-create", "-test-update"]) == 0
    out = capsys.readouterr()
    assert "test-update: ok" in out.out + out.err


def test_engine_stop_update_resumes(tmp_path):
    """Engine.stop_update interrupts mid-scan after a committed batch; the
    next update picks up exactly the remaining files."""
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams
    from fixtures import make_corpus

    root = str(tmp_path)
    make_corpus(root, n_base=4, scales=(1.0, 0.5))  # 8 files
    p = IndexParams()
    p.algos = 1  # dct only
    p.fSize = 128
    eng = Engine(root, p)
    eng.scanner._hasher.batch = 2  # progress fires every 2 images

    def stop_soon(done, total):
        if done >= 2:
            eng.stop_update()

    s1 = eng.update(progress=stop_soon)
    assert s1["stopped"] and 2 <= s1["added"] < 8
    mid = eng.db.count()
    assert mid == s1["added"]
    s2 = eng.update()
    assert not s2["stopped"] and s2["added"] == 8 - mid
    assert eng.db.count() == 8
    s3 = eng.update()  # stable
    assert s3["added"] == 0 and s3["modified"] == 0


def test_complete_lists_new_verbs(capsys):
    """-complete must advertise every verb, incl. the round-5 additions
    (reference shell completion, src/main.cpp:150-354)."""
    assert main(["-complete", "bash"]) == 0
    out = capsys.readouterr().out
    for verb in ("-updatemd5", "-test-update", "-similar", "-verify"):
        assert verb in out, verb
