"""HTTP serving endpoint (lctvqa/serve.py).

Contract: the server answers exactly what the artifact's programs answer
(question encoding == data/preprocess.encode_question), concurrent
requests are fused into batched dispatches, and malformed requests get a
400 instead of killing the server. The reference has no serving path.
"""

import base64
import dataclasses
import json
import os
import threading
import urllib.request

import jax
import numpy as np
import pytest

from lctvqa import export as exp_mod
from lctvqa import serve as serve_mod
from lctvqa.models import vqa_w


@pytest.fixture(scope="module")
def w_server(tmp_path_factory, tiny_cfg, synth_dir):
    from lctvqa.text import VocabDict

    # vocab sizes come from the dataset's vocab files, exactly as training
    # derives them (main.py:176) — export_state refuses mismatched dirs
    mcfg = dataclasses.replace(
        tiny_cfg.model, img_size=32, arch_type="fixed",
        qst_vocab_size=VocabDict(
            os.path.join(synth_dir, "vocab_questions.txt")).vocab_size,
        ans_vocab_size=VocabDict(
            os.path.join(synth_dir, "vocab_answers.txt")).vocab_size)
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), mcfg)
    artifact = exp_mod.export_state({"w_params": params}, mcfg,
                                    input_dir=synth_dir)
    path = str(tmp_path_factory.mktemp("srv") / "w.lctx")
    exp_mod.save_artifact(artifact, path)
    srv = serve_mod.make_server(path, port=0, window_ms=50.0, max_batch=8)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, mcfg, artifact
    srv.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.loads(r.read())


def test_healthz_and_meta(w_server):
    srv, _, _ = w_server
    port = srv.server_address[1]
    h = _get(port, "/healthz")
    assert h["ok"] and h["family"] == "w"
    m = _get(port, "/meta")
    assert m["img_size"] == 32 and "qst_words" not in m
    assert m["qst_vocab_len"] > 0


def test_answer_matches_artifact_and_batches(w_server):
    """N concurrent requests: every answer equals the direct artifact
    apply with preprocess-exact question encoding, and the micro-batcher
    actually fused some of them."""
    srv, mcfg, artifact = w_server
    port = srv.server_address[1]
    model = exp_mod.ServingModel(artifact)
    svc = srv.RequestHandlerClass.service

    rng = np.random.default_rng(0)
    n = 8
    imgs = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    question = "what color is the ball"

    results = [None] * n

    def ask(i):
        status, out = _post(port, "/answer", {
            "image": imgs[i].tolist(), "question": question})
        results[i] = (status, out)

    threads = [threading.Thread(target=ask, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # oracle: encode the question the offline way and call the artifact
    from lctvqa.data.preprocess import encode_question
    from lctvqa.text import VocabDict, tokenize
    qv = VocabDict(word_list=model.meta["qst_words"])
    vec, _ = encode_question(tokenize(question), qv.word2idx_dict,
                             mcfg.max_qst_len)
    want = model.answers(imgs, np.tile(vec.astype(np.int32), (n, 1)))
    for i, (status, out) in enumerate(results):
        assert status == 200
        assert out["answer"] == want[i]
    # concurrency + the 50ms window must have produced >=1 fused dispatch
    assert max(svc.batcher.batch_sizes) > 1


def test_warmup_compiles_all_buckets(w_server):
    srv, _, _ = w_server
    svc = srv.RequestHandlerClass.service
    # max_batch=8 -> buckets 1,2,4,8; W artifact has 1 function
    assert svc.warmup() == 4


def test_answer_accepts_raw_b64_image(w_server):
    srv, _, _ = w_server
    port = srv.server_address[1]
    img = np.zeros((32, 32, 3), np.uint8)
    status, out = _post(port, "/answer", {
        "image_b64": base64.b64encode(img.tobytes()).decode(),
        "question": "what is this"})
    assert status == 200 and "answer" in out


def test_bad_requests_get_400(w_server):
    srv, _, _ = w_server
    port = srv.server_address[1]
    status, out = _post(port, "/answer", {"image": [[0]],
                                          "question": "hm"})
    assert status == 400 and "shape" in out["error"]
    status, out = _post(port, "/generate", {
        "image": np.zeros((32, 32, 3), np.uint8).tolist()})
    assert status == 400 and "generate" in out["error"]
    status, _ = _post(port, "/nope", {})
    assert status == 404


def test_unified_generate_endpoint(tmp_path, tiny_cfg, synth_dir):
    from lctvqa.models import unified as unified_model
    from lctvqa.text import VocabDict

    uni = VocabDict(os.path.join(synth_dir, "vocab_unified.txt"))
    mcfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                               arch_type="fixed",
                               qst_vocab_size=uni.vocab_size)
    params, _ = unified_model.init_unified_model(jax.random.PRNGKey(1),
                                                 mcfg)
    artifact = exp_mod.export_state({"params": params}, mcfg,
                                    input_dir=synth_dir)
    path = str(tmp_path / "u.lctx")
    exp_mod.save_artifact(artifact, path)
    srv = serve_mod.make_server(path, port=0, window_ms=1.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        img = np.zeros((32, 32, 3), np.uint8)
        status, out = _post(port, "/generate", {"image": img.tolist()})
        assert status == 200 and "qa" in out and "answer" in out
        # unified artifacts have no answer_logits endpoint
        status, out = _post(port, "/answer", {"image": img.tolist(),
                                              "question": "x"})
        assert status == 400 and "generate" in out["error"]
    finally:
        srv.shutdown()


def test_unexpected_handler_error_gets_500_not_dropped(w_server):
    """Chip-found bug: an exception class do_POST didn't catch closed the
    connection with NO response (client sees RemoteDisconnected). Any
    unexpected error must come back as a 500 JSON body — and the body
    must be generic (exception reprs can leak paths/internals)."""
    srv, _, _ = w_server
    port = srv.server_address[1]
    svc = srv.RequestHandlerClass.service
    orig = svc.answer
    svc.answer = lambda payload: (_ for _ in ()).throw(
        IndexError("list index out of range"))
    try:
        status, out = _post(port, "/answer", {"question": "x"})
        assert status == 500
        assert out["error"] == "internal server error"
        assert "IndexError" not in out["error"]
    finally:
        svc.answer = orig
