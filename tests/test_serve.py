"""Resident query server (-serve): warm engine behind a JSON-lines TCP
protocol; CLI clients route -similar-to through CBIRD_SERVER."""

import os

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.cli.main import main
from fixtures import synth_image


@pytest.fixture()
def served(tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    rng = np.random.default_rng(41)
    for i in range(2):
        img = synth_image(rng, 150, 200)
        Image.fromarray(img).save(os.path.join(root, f"base{i}.png"))
        Image.fromarray(img).resize((160, 120), Image.BOX).save(
            os.path.join(root, f"dup{i}.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0

    from cbird_tpu.host.engine import Engine
    from cbird_tpu.cli.serve import QueryServer
    from cbird_tpu.params import IndexParams
    eng = Engine(root, IndexParams())
    srv = QueryServer(eng)
    srv.warmup()
    srv.start_background()
    yield root, srv
    srv.close()
    eng.db.close()


def test_serve_protocol(served):
    from cbird_tpu.cli.serve import QueryClient
    root, srv = served
    addr = f"{srv.address[0]}:{srv.address[1]}"
    c = QueryClient(addr)
    assert c.call({"cmd": "ping"})["pong"]
    st = c.call({"cmd": "status"})
    assert st["ok"] and st["items"] == 4

    groups = c.query(os.path.join(root, "base0.png"), dht="8")
    assert len(groups) == 1
    paths = {os.path.basename(d["path"]) for d in groups[0]}
    assert paths == {"base0.png", "dup0.png"}

    # unknown command and bad params answer, never kill the daemon
    assert not c.call({"cmd": "nope"})["ok"]
    assert not c.call({"cmd": "query", "path": ""})["ok"]
    assert c.call({"cmd": "ping"})["pong"]
    c.close()


def test_serve_cli_routing(served, monkeypatch, capsys):
    root, srv = served
    monkeypatch.setenv("CBIRD_SERVER", f"{srv.address[0]}:{srv.address[1]}")
    rc = main(["-use", root, "-p.dht", "8",
               "-similar-to", os.path.join(root, "base1.png"), "-dump"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dup1.png" in out


def test_parse_hostport():
    from cbird_tpu.cli.serve import parse_hostport
    assert parse_hostport("127.0.0.1:8080") == ("127.0.0.1", 8080)
    assert parse_hostport("localhost") == ("localhost", 0)  # bare host
    assert parse_hostport("8080") == ("127.0.0.1", 8080)    # bare port
    assert parse_hostport("") == ("127.0.0.1", 0)
    assert parse_hostport("[::1]:90") == ("::1", 90)
    assert parse_hostport("::1") == ("::1", 0)
    with pytest.raises(ValueError):
        parse_hostport("host:notaport")


def test_serve_params_roundtrip():
    """Every explicitly-set SearchParams value survives the client's
    changed_kv() -> server set_param() round-trip, including a FLAGS
    param cleared to 0 (formatted as 'none')."""
    from cbird_tpu.params import SearchParams
    p = SearchParams()
    p.set_param("refl", "0")   # FLAGS = 0 -> formats as "none"
    p.set_param("alg", "dct")
    p.set_param("dht", "8")
    q = SearchParams()
    for k, v in p.changed_kv():
        q.set_param(k, v)
    assert q.mirrorMask == 0 and q.dctThresh == 8 and q.algo == p.algo


def test_serve_stop(served):
    from cbird_tpu.cli.serve import QueryClient
    root, srv = served
    c = QueryClient(f"{srv.address[0]}:{srv.address[1]}")
    assert c.call({"cmd": "stop"})["stopping"]
    c.close()
