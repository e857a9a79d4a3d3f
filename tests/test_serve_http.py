"""Online-serving tests: MicroBatcher coalescing/correctness and the HTTP
daemon (predict round-trip vs the direct engine, top-k JSON, healthz/stats,
malformed-request handling) — tiny ViT engine on the CPU mesh."""
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.models import vit as vvit
from vit_project_tpu.serve import MicroBatcher, ServingDaemon, \
    vit_classifier_engine

TINY = vvit.VIT_CONFIGS["test-tiny"]


def _engine(**kw):
    params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("use_pallas", False)
    kw.setdefault("buckets", (4, 8))
    return vit_classifier_engine(params, TINY, **kw)


def _images(n, seed=0):
    rs = np.random.RandomState(seed)
    return rs.rand(n, TINY.image_size, TINY.image_size, 3).astype(np.float32)


class TestMicroBatcher:
    def test_concurrent_submits_correct_per_request(self):
        """Results are scattered back to the right caller regardless of how
        the window coalesced them."""
        eng = _engine()
        mb = MicroBatcher(eng, max_delay_ms=30.0)
        try:
            reqs = [_images(n, seed=n) for n in (1, 2, 3, 1)]
            futs = [mb.submit(r) for r in reqs]
            for r, f in zip(reqs, futs):
                got = f.result(timeout=60)
                want = eng(r)
                np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
                assert got.shape == (len(r), TINY.num_classes)
        finally:
            mb.close()

    def test_coalescing_reduces_dispatches(self):
        """Requests submitted inside one window share an engine dispatch."""
        eng = _engine()
        eng(_images(4))  # warm the bucket compile so the window isn't eaten
        mb = MicroBatcher(eng, max_delay_ms=500.0)
        try:
            futs = [mb.submit(_images(1, seed=i)) for i in range(4)]
            for f in futs:
                f.result(timeout=60)
            assert mb.dispatches < 4  # 4 singles did NOT dispatch 4 times
            assert mb.images == 4
        finally:
            mb.close()

    def test_error_delivered_not_fatal(self):
        """A bad request fails ITS future; the dispatcher keeps serving."""
        eng = _engine()
        mb = MicroBatcher(eng, max_delay_ms=1.0)
        try:
            bad = mb.submit(np.zeros((2, 7, 7, 3), np.float32))  # wrong HW
            with pytest.raises(Exception):
                bad.result(timeout=60)
            good = mb.submit(_images(2))
            assert good.result(timeout=60).shape == (2, TINY.num_classes)
        finally:
            mb.close()

    def test_close_rejects_new_submits(self):
        mb = MicroBatcher(_engine(), max_delay_ms=1.0)
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit(_images(1))


def _post_npy(port, arr, query=""):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict{query}", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"})
    return urllib.request.urlopen(req, timeout=60)


class TestHttpDaemon:
    @pytest.fixture(scope="class")
    def daemon(self):
        eng = _engine()
        d = ServingDaemon(eng, image_shape=(TINY.image_size, TINY.image_size,
                                            3), port=0, max_delay_ms=2.0)
        d.start()
        yield d, eng
        d.shutdown()

    def test_predict_roundtrip_matches_engine(self, daemon):
        d, eng = daemon
        imgs = _images(3)
        resp = _post_npy(d.port, imgs)
        assert resp.headers["Content-Type"] == "application/x-npy"
        got = np.load(io.BytesIO(resp.read()))
        np.testing.assert_allclose(got, eng(imgs), rtol=1e-6, atol=1e-6)

    def test_single_unbatched_image(self, daemon):
        d, eng = daemon
        img = _images(1)[0]
        got = np.load(io.BytesIO(_post_npy(d.port, img).read()))
        assert got.shape == (1, TINY.num_classes)
        np.testing.assert_allclose(got, eng(img[None]), rtol=1e-6, atol=1e-6)

    def test_topk_json(self, daemon):
        d, eng = daemon
        imgs = _images(2)
        resp = _post_npy(d.port, imgs, query="?topk=2")
        body = json.loads(resp.read())
        want = eng(imgs)
        for row, preds in zip(want, body["predictions"]):
            assert len(preds) == 2
            assert preds[0]["index"] == int(np.argmax(row))
            assert preds[0]["score"] >= preds[1]["score"]

    def test_concurrent_clients(self, daemon):
        d, eng = daemon
        results = {}

        def client(i):
            imgs = _images(2, seed=100 + i)
            out = np.load(io.BytesIO(_post_npy(d.port, imgs).read()))
            results[i] = (imgs, out)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        [t.start() for t in threads]
        [t.join(timeout=120) for t in threads]
        assert len(results) == 4
        for imgs, out in results.values():
            np.testing.assert_allclose(out, eng(imgs), rtol=1e-6, atol=1e-6)

    def test_healthz_and_stats(self, daemon):
        d, eng = daemon
        h = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{d.port}/v1/healthz", timeout=30).read())
        assert h["status"] == "ok"
        assert h["buckets"] == list(eng.buckets)
        _post_npy(d.port, _images(2))
        s = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{d.port}/v1/stats", timeout=30).read())
        assert s["requests"] >= 1 and s["images"] >= 2
        assert s["latency_ms"]["p50"] is not None

    def test_malformed_body_400(self, daemon):
        d, _ = daemon
        req = urllib.request.Request(
            f"http://127.0.0.1:{d.port}/v1/predict", data=b"not npy")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_wrong_shape_400(self, daemon):
        d, _ = daemon
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npy(d.port, np.zeros((2, 7, 7, 3), np.float32))
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert "expected" in body["error"]

    def test_unknown_route_404(self, daemon):
        d, _ = daemon
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{d.port}/v1/nope", timeout=30)
        assert ei.value.code == 404


class TestReviewFixes:
    def test_close_with_queued_request_does_not_hang(self):
        """A close() racing a long coalescing window must not strand the
        dispatcher: the sentinel is re-enqueued, the in-hand batch is
        served, and the thread exits promptly."""
        import time
        eng = _engine()
        eng(_images(1))  # pre-compile so serving is instant
        mb = MicroBatcher(eng, max_delay_ms=30_000.0)
        fut = mb.submit(_images(2))
        time.sleep(0.3)  # let the dispatcher enter its coalescing window
        t0 = time.monotonic()
        mb.close()
        assert time.monotonic() - t0 < 8  # not the 10s join timeout
        assert not mb._thread.is_alive()
        assert fut.result(timeout=1).shape == (2, TINY.num_classes)

    def test_invalid_topk_is_400_before_inference(self, ):
        eng = _engine()
        d = ServingDaemon(eng, image_shape=(TINY.image_size, TINY.image_size,
                                            3), port=0, max_delay_ms=1.0)
        d.start()
        try:
            before = d.batcher.dispatches
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post_npy(d.port, _images(1), query="?topk=abc")
            assert ei.value.code == 400
            assert "topk" in json.loads(ei.value.read())["error"]
            assert d.batcher.dispatches == before  # no TPU work was spent
        finally:
            d.shutdown()

    def test_oversized_body_is_413(self):
        eng = _engine()
        d = ServingDaemon(eng, image_shape=(TINY.image_size, TINY.image_size,
                                            3), port=0, max_delay_ms=1.0,
                          max_body_mb=0.001)
        d.start()
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post_npy(d.port, _images(4))
            assert ei.value.code == 413
        finally:
            d.shutdown()

    def test_http_preprocess_uint8_float_agree(self):
        """The per-request canonicalization (cli.serve._http_preprocess)
        maps a uint8 image and its float [0,1] twin to the SAME engine
        input for both engine families — the mixed-window dtype-promotion
        hazard the per-request placement exists to prevent."""
        from vit_project_tpu.cli.serve import _http_preprocess
        rs = np.random.RandomState(0)
        u8 = rs.randint(0, 256, (2, 8, 8, 3), np.uint8)
        f01 = u8.astype(np.float32) / 255.0
        for norm in (None, ((0.5, 0.4, 0.3), (0.2, 0.3, 0.4))):
            pre = _http_preprocess(norm)
            np.testing.assert_allclose(pre(u8), pre(f01),
                                       rtol=1e-6, atol=1e-6)


class TestHttpRobustness:
    def test_garbage_requests_never_kill_the_daemon(self):
        """Random garbage bodies/paths/queries always produce an HTTP error
        response (or a clean 413 close) — never an unhandled exception that
        drops the connection or kills a handler thread — and the daemon
        still serves a valid request afterwards."""
        import http.client
        eng = _engine()
        d = ServingDaemon(eng, image_shape=(TINY.image_size, TINY.image_size,
                                            3), port=0, max_delay_ms=1.0,
                          max_body_mb=1.0)
        d.start()
        rs = np.random.RandomState(0)
        try:
            cases = [
                ("POST", "/v1/predict", rs.bytes(64)),            # not npy
                ("POST", "/v1/predict", b""),                      # empty
                ("POST", "/v1/predict?topk=", rs.bytes(16)),       # bad topk
                ("POST", "/v1/predict?topk=-3", _npy(_images(1))), # neg topk
                ("POST", "/v1/nope", rs.bytes(32)),                # bad route
                ("POST", "/v1/predict", _npy(np.zeros((2, 2), np.float32))),
                ("GET", "/v1/predict", None),                      # bad verb
                ("POST", "/v1/predict",
                 _npy(np.zeros((99, 99), np.uint8))),              # bad shape
            ]
            for method, path, body in cases:
                conn = http.client.HTTPConnection("127.0.0.1", d.port,
                                                  timeout=60)
                try:
                    conn.request(method, path, body=body)
                    resp = conn.getresponse()
                    assert 200 <= resp.status < 600
                    resp.read()
                finally:
                    conn.close()
            # oversized body: rejected by declared length (413, conn closed)
            conn = http.client.HTTPConnection("127.0.0.1", d.port, timeout=60)
            try:
                conn.request("POST", "/v1/predict",
                             body=b"x" * (2 << 20))
                assert conn.getresponse().status == 413
            finally:
                conn.close()
            # the daemon still serves correctly after all of the above
            imgs = _images(2)
            got = np.load(io.BytesIO(_post_npy(d.port, imgs).read()))
            np.testing.assert_allclose(got, eng(imgs), rtol=1e-6, atol=1e-6)
        finally:
            d.shutdown()


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()
