"""HTML report (-show) + CSV accuracy harness (-test-csv) + env utils."""

import os

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.cli.main import main
from cbird_tpu.utils.env import process_memory, system_memory

from fixtures import make_corpus

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def indexed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("repcsv"))
    groups = make_corpus(root, n_base=3, scales=(1.0, 0.5))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "128",
                 "-create", "-update"]) == 0
    return root, groups


def test_show_writes_html(indexed, monkeypatch, tmp_path):
    root, groups = indexed
    out = str(tmp_path / "report.html")
    monkeypatch.setenv("CBIRD_REPORT", out)
    assert main(["-use", root, "-similar", "-show"]) == 0
    html = open(out).read()
    assert "<html>" in html and "group 0" in html
    assert "data:image/jpeg;base64," in html  # thumbnails inlined
    assert "needle" in html


def test_test_csv_pass(indexed, tmp_path):
    root, groups = indexed
    csv_file = tmp_path / "cases.csv"
    lines = []
    for base, paths in groups.items():
        lines.append(f"{os.path.basename(paths[0])},{os.path.basename(paths[1])}")
    csv_file.write_text("\n".join(lines) + "\n# comment line\n")
    assert main(["-use", root, "-test-csv", str(csv_file)]) == 0
    out = (tmp_path / "match.csv").read_text()
    assert "pass" in out and "FAIL" not in out


def test_test_csv_fail(indexed, tmp_path):
    root, groups = indexed
    csv_file = tmp_path / "bad.csv"
    a = os.path.basename(groups["img000"][0])
    wrong = os.path.basename(groups["img001"][0])  # not a real match
    csv_file.write_text(f"{a},{wrong}\n")
    assert main(["-use", root, "-test-csv", str(csv_file)]) == 2


def test_env_utils():
    total, avail = system_memory()
    assert total > 0 and 0 < avail <= total
    assert process_memory() > 10 << 20  # a python+jax process is >10MB
