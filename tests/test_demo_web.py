"""End-to-end drive of the first-party web demo (demo_web.py): serve the
page, upload a synthetic mp4, ask through beam search, reset — over real
HTTP against the tiny debug config (random weights, CPU)."""

import argparse
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server_port(tmp_path_factory):
    import demo_web

    args = argparse.Namespace(cfg_path="config/tiny_debug.yaml",
                              ckpt_path=None, options=None, cpu=True)
    chat = demo_web.build_chat(args)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), demo_web.make_handler(chat))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def _post(port, path, data, headers):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data,
                                 headers=headers)
    return json.loads(urllib.request.urlopen(req, timeout=300).read())


def test_web_demo_roundtrip(server_port, tmp_path):
    cv2 = pytest.importorskip("cv2")

    html = urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/", timeout=30).read()
    assert b"Upload video" in html and b"/api/ask" in html

    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(20):
        vw.write(np.full((64, 64, 3), 25 + 9 * i, np.uint8))
    vw.release()

    up = _post(server_port, "/api/upload?segments=4",
               open(path, "rb").read(), {"X-Filename": "v.mp4"})
    assert "session" in up

    ans = _post(server_port, "/api/ask",
                json.dumps({"session": up["session"], "question": "What?",
                            "num_beams": 2, "max_new_tokens": 4}).encode(),
                {"Content-Type": "application/json"})
    assert isinstance(ans.get("answer"), str)

    # unknown session -> clean 400-style error, not a crash
    try:
        bad = _post(server_port, "/api/ask",
                    json.dumps({"session": "nope", "question": "?"}).encode(),
                    {"Content-Type": "application/json"})
    except urllib.error.HTTPError as e:
        bad = json.loads(e.read())
    assert "error" in bad

    ok = _post(server_port, "/api/reset",
               json.dumps({"session": up["session"]}).encode(),
               {"Content-Type": "application/json"})
    assert ok == {"ok": True}
