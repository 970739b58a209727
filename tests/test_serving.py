"""Serving engine + HTTP server tests (tiny CPU model)."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.eval.eval_cdsprites import _as_infer
from multimodal_vae_comparison_tpu.serving.engine import InferenceEngine
from multimodal_vae_comparison_tpu.serving.server import make_handler
from multimodal_vae_comparison_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg = Config({
        "batch_size": 8, "epochs": 1, "exp_name": "srv", "lr": 1e-3,
        "mixing": "poe", "n_latents": 4, "dataset_name": "synthetic",
        "labels": None, "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": "32"},
        "modality_2": {"encoder": "FNN", "decoder": "TxtTransformer",
                       "mod_type": "text", "path": "32"},
    }, results_root=str(tmp))
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    infer = _as_infer(trainer)
    return InferenceEngine(infer, buckets=(2, 8)), infer


def test_generate_pads_to_bucket_and_trims(engine):
    eng, infer = engine
    data = np.random.default_rng(0).random((5, 64, 64, 3)).astype(np.float32)
    out = eng.generate({"mod_1": {"data": data}})
    assert out["mod_1"].shape == (5, 64, 64, 3)
    assert out["mod_2"].shape[0] == 5
    # repeat -> same compiled fn reused (one per present-set)
    out2 = eng.generate({"mod_1": {"data": data[:1]}})
    assert out2["mod_1"].shape[0] == 1
    assert len(eng._fns) == 1


def test_concurrent_generate_same_present_set(engine):
    """First call per (present-set, bucket) shape serializes under the
    compile lock; concurrent callers must all get identical, correct
    results and warm exactly the shapes they used."""
    eng, infer = engine
    data = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)
    results, errors = [None] * 4, []

    def hit(i):
        try:
            results[i] = eng.generate({"mod_1": {"data": data}})
        except Exception as e:  # surface failures in the main thread
            errors.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for r in results[1:]:
        np.testing.assert_allclose(r["mod_1"], results[0]["mod_1"])
    assert (("mod_1",), 2) in eng._warm


def test_decode_latents(engine):
    eng, infer = engine
    out = eng.decode_latents(np.zeros((3, 4), np.float32))
    assert out["mod_1"].shape == (3, 64, 64, 3)


def test_generate_input_validation(engine):
    eng, infer = engine
    data = np.zeros((2, 64, 64, 3), np.float32)
    with pytest.raises(ValueError):
        eng.generate({})
    with pytest.raises(KeyError):
        eng.generate({"mod_9": {"data": data}})
    with pytest.raises(ValueError):
        eng.generate({"mod_1": {"data": data},
                      "mod_2": {"data": np.zeros((3, 32, 27), np.float32)}})


def test_decode_latents_caches_compiles(engine):
    eng, infer = engine
    eng._dec_fns.clear()
    eng.decode_latents(np.zeros((3, 4), np.float32))
    n = len(eng._dec_fns)
    assert n == len(infer.mod_names)
    eng.decode_latents(np.ones((3, 4), np.float32))
    assert len(eng._dec_fns) == n  # same shape -> no new executables


def test_http_concurrent_requests(engine):
    """ThreadingHTTPServer dispatches handlers on parallel threads; N
    simultaneous POSTs must all succeed and share one compiled fn per
    present-set (the engine lock prevents a compile stampede)."""
    eng, infer = engine
    eng._fns.clear()
    from http.server import ThreadingHTTPServer
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng, infer))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    results, errors = [], []

    def hit(i):
        try:
            req = {"inputs": {"mod_1": {
                "data": np.full((2, 64, 64, 3), i / 8.0).tolist()}},
                "seed": i}
            resp = json.load(urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(req).encode(),
                headers={"Content-Type": "application/json"}), timeout=120))
            results.append(np.asarray(resp["mod_2"]).shape)
        except Exception as e:  # surface in main thread
            errors.append(repr(e))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.shutdown()
    assert not errors, errors
    assert len(results) == 6 and all(s[0] == 2 for s in results)
    assert len(eng._fns) == 1  # one executable for the shared present-set


def test_http_error_paths(engine):
    eng, infer = engine
    from http.server import ThreadingHTTPServer
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng, infer))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        # unknown POST path -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/nope", data=b"{}"))
        assert e.value.code == 404
        # unknown modality -> 400 with the engine's message
        req = {"inputs": {"mod_9": {"data": [[0.0]]}}}
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(req).encode()))
        assert e.value.code == 400
        assert "mod_9" in json.load(e.value)["error"]
        # missing "inputs" key -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=b"{}"))
        assert e.value.code == 400
        # server-side failure -> 500, not 400 (retry logic keys on 4xx/5xx)
        boom = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
        orig = eng.generate
        eng.generate = boom
        try:
            req = {"inputs": {"mod_1": {"data": [[0.0] * 5]}}}
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate",
                    data=json.dumps(req).encode()))
            assert e.value.code == 500
            assert "boom" in json.load(e.value)["error"]
        finally:
            eng.generate = orig
    finally:
        srv.shutdown()


def test_http_surface(engine):
    eng, infer = engine
    from http.server import ThreadingHTTPServer
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng, infer))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        health = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health"))
        assert health["status"] == "ok"
        assert health["modalities"] == ["mod_1", "mod_2"]
        req = {"inputs": {"mod_1": {"data": np.zeros((2, 64, 64, 3)).tolist()}}}
        resp = json.load(urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"})))
        assert np.asarray(resp["mod_2"]).shape[0] == 2
        # malformed payload -> 400
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=b"junk",
                headers={"Content-Type": "application/json"}))
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
