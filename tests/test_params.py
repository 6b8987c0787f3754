"""Params registry: same keys/defaults/parse semantics as the reference
(-p.* src/index.cpp:54-174, -i.* src/scanner.cpp:1236-1333)."""

import pytest

from cbird_tpu.params import IndexParams, ParamError, SearchParams

pytestmark = pytest.mark.smoke


def test_search_defaults():
    p = SearchParams()
    assert p.algo == SearchParams.ALGO_DCT
    assert p.dctThresh == 5
    assert p.cvThresh == 25
    assert p.maxMatches == 5
    assert p.tmThresh == 7
    assert p.skipFrames == 300
    assert p.minFramesMatched == 30
    assert p.minFramesNear == 60
    assert p.videoRadix == 10
    assert p.filterSelf is True
    assert p.filterGroups is True


def test_index_defaults():
    p = IndexParams()
    assert p.algos == 31
    assert p.resizeLongestSide == 400
    assert p.numFeatures == 400
    assert p.videoThreshold == 8
    assert p.writeBatchSize == 1024
    assert p.minFileSize == 1024


def test_enum_parse():
    p = SearchParams()
    p.set_param("alg", "fdct")
    assert p.algo == SearchParams.ALGO_DCT_FEATURES
    p.set_param("alg", "4")
    assert p.algo == SearchParams.ALGO_VIDEO
    with pytest.raises(ParamError):
        p.set_param("alg", "bogus")


def test_flags_parse():
    p = SearchParams()
    p.set_param("refl", "h+v")
    assert p.mirrorMask == 3
    p2 = IndexParams()
    p2.set_param("algos", "dct+color")
    assert p2.algos == (1 << 0) | (1 << 3)


def test_int_range():
    p = SearchParams()
    p.set_param("dht", "12")
    assert p.dctThresh == 12
    with pytest.raises(ParamError):
        p.set_param("dht", "100")


def test_algo_types_link():
    # "-p.alg video" implies types i+v unless -p.types was given first
    p = SearchParams()
    p.set_param("alg", "video")
    assert p.queryTypes == 3
    p2 = SearchParams()
    p2.set_param("types", "i")
    p2.set_param("alg", "video")
    assert p2.queryTypes == 1


def test_glob_append():
    p = IndexParams()
    p.set_param("exclude", "*.tmp")
    p.set_param("exclude", "cache/*")
    assert p.excludePatterns == ["*.tmp", "cache/*"]
    assert not p.path_included("/a/b/x.tmp")
    assert p.path_included("/a/b/x.jpg")


def test_help_text():
    p = SearchParams()
    txt = p.help_text()
    assert "dht" in txt and "DCT hash distance threshold" in txt
    assert "Algorithm" in txt
