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
    try:
        yield httpd.server_address[1]
    finally:
        httpd.shutdown()
        httpd.server_close()


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


def test_concurrent_sessions_co_decode(tmp_path):
    """--serve-slots path: two sessions ask at the same time through the
    AnswerService-backed handler and each gets the same greedy answer the
    serialized (no-service) handler produces; a beam ask falls back to the
    solo path transparently."""
    cv2 = pytest.importorskip("cv2")
    import demo_web
    from stllm_tpu.serving import AnswerService, ContinuousBatcher

    args = argparse.Namespace(cfg_path="config/tiny_debug.yaml",
                              ckpt_path=None, options=None, cpu=True)
    chat = demo_web.build_chat(args)
    service = AnswerService(ContinuousBatcher(
        chat.params["llama"], chat.cfg.llama, slots=2, max_len=256))

    plain = ThreadingHTTPServer(("127.0.0.1", 0),
                                demo_web.make_handler(chat))
    served = ThreadingHTTPServer(("127.0.0.1", 0),
                                 demo_web.make_handler(chat, service=service))
    for httpd in (plain, served):
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    p_plain = plain.server_address[1]
    p_served = served.server_address[1]
    try:
        _drive_co_decode(cv2, tmp_path, p_plain, p_served)
    finally:
        # cleanup must run even on failure: leaked serve_forever threads +
        # a live AnswerService step loop otherwise outlive the test and
        # pollute every later module (round-4 full-suite triage)
        plain.shutdown()
        plain.server_close()
        served.shutdown()
        served.server_close()
        service.close()


def _drive_co_decode(cv2, tmp_path, p_plain, p_served):
    vids = {}
    for name, base in (("a", 30), ("b", 90)):
        path = str(tmp_path / f"{name}.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (64, 64))
        for i in range(16):
            vw.write(np.full((64, 64, 3), base + 5 * i, np.uint8))
        vw.release()
        vids[name] = open(path, "rb").read()

    def ask(port, sid, question, **kw):
        body = {"session": sid, "question": question, "temperature": 0.0,
                "max_new_tokens": 6, **kw}
        return _post(port, "/api/ask", json.dumps(body).encode(),
                     {"Content-Type": "application/json"})["answer"]

    want = {}
    for name, q in (("a", "What happens?"), ("b", "How many objects?")):
        up = _post(p_plain, "/api/upload?segments=4", vids[name],
                   {"X-Filename": f"{name}.mp4"})
        want[name] = ask(p_plain, up["session"], q)

    sids = {name: _post(p_served, "/api/upload?segments=4", vids[name],
                        {"X-Filename": f"{name}.mp4"})["session"]
            for name in vids}
    got, errs = {}, []

    def worker(name, q):
        try:
            got[name] = ask(p_served, sids[name], q)
        except Exception as e:
            errs.append((name, e))

    threads = [threading.Thread(target=worker, args=("a", "What happens?")),
               threading.Thread(target=worker, args=("b", "How many objects?"))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    assert got == want

    # beam request through the service-enabled handler: batcher rejects it
    # at submit, Chat.answer falls back to solo generate — still answers
    beam = ask(p_served, sids["a"], "What happens?", num_beams=2)
    assert isinstance(beam, str)


def test_prefix_kv_multiturn_identical(tmp_path):
    """--prefix-kv path: a 3-turn conversation through the session-KV
    handler gives the same answers as the plain (full re-prefill) handler,
    turns 2-3 actually reuse cached tokens, and LRU eviction + reset
    release cleanly."""
    cv2 = pytest.importorskip("cv2")
    import demo_web

    args = argparse.Namespace(cfg_path="config/tiny_debug.yaml",
                              ckpt_path=None, options=None, cpu=True)
    chat = demo_web.build_chat(args)

    plain = ThreadingHTTPServer(("127.0.0.1", 0), demo_web.make_handler(chat))
    kvd = ThreadingHTTPServer(("127.0.0.1", 0),
                              demo_web.make_handler(chat, prefix_kv=1))
    for httpd in (plain, kvd):
        threading.Thread(target=httpd.serve_forever, daemon=True).start()

    try:
        path = str(tmp_path / "v.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (64, 64))
        for i in range(16):
            vw.write(np.full((64, 64, 3), 50 + 7 * i, np.uint8))
        vw.release()
        raw = open(path, "rb").read()

        def drive(port):
            sid = _post(port, "/api/upload?segments=4", raw,
                        {"X-Filename": "v.mp4"})["session"]
            answers = []
            for q in ("What happens?", "Any people?", "What color?"):
                body = {"session": sid, "question": q, "temperature": 0.0,
                        "max_new_tokens": 5}
                answers.append(
                    _post(port, "/api/ask", json.dumps(body).encode(),
                          {"Content-Type": "application/json"})["answer"])
            return sid, answers

        sid_kv, got = drive(kvd.server_address[1])
        _, want = drive(plain.server_address[1])
        assert got == want

        ok = _post(kvd.server_address[1], "/api/reset",
                   json.dumps({"session": sid_kv}).encode(),
                   {"Content-Type": "application/json"})
        assert ok == {"ok": True}
    finally:
        plain.shutdown()
        plain.server_close()
        kvd.shutdown()
        kvd.server_close()
