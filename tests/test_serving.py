"""Serving layer: micro-batching core + HTTP transport end-to-end.

Hermetic: the IdentityModel (GT passthrough) serves synthetic box clips
over a real localhost HTTP socket — predictions must round-trip the npz
wire format bit-exactly, concurrent requests must coalesce into batches,
and errors must surface as 400s, never hang the dispatch thread.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from unigeo_tpu.models.identity import IdentityModel
from unigeo_tpu.serving import (
    HTTPInferenceServer,
    InferenceServer,
    decode_arrays,
    encode_arrays,
    warmup_clip,
)


@pytest.fixture(scope="module")
def clip():
    return warmup_clip(num_frames=2, hw=(32, 32))


def _sendable(clip):
    """The unified sample minus non-array entries (what a client sends)."""
    return {
        k: v for k, v in clip.items()
        if isinstance(v, np.ndarray) or np.isscalar(v)
    }


def test_wire_roundtrip(clip):
    payload = encode_arrays(_sendable(clip))
    back = decode_arrays(payload)
    assert back["keyview_idx"] == clip["keyview_idx"]  # 0-d → scalar
    np.testing.assert_array_equal(back["images"], clip["images"])
    np.testing.assert_array_equal(back["extrinsics"], clip["extrinsics"])


def test_core_predict_and_stats(clip):
    srv = InferenceServer(IdentityModel(), max_batch=2)
    try:
        out = srv.predict(clip)
        assert out["pred_depths"].shape == clip["mask"].shape
        # GT passthrough: depth equals -z of the gl cam coords
        np.testing.assert_allclose(
            out["pred_depths"], -clip["cam_coord"][:, 2], atol=1e-5
        )
        s = srv.stats()
        assert s["served"] == 1 and s["latency_p50_s"] >= 0
    finally:
        srv.close()


def test_core_batching(clip):
    """Concurrent requests coalesce (mean_batch > 1) and all succeed."""

    class SlowIdentity(IdentityModel):
        def forward(self, data):
            import time

            time.sleep(0.05)  # hold the dispatch thread so requests pile up
            return super().forward(data)

        def forward_batch(self, datas):
            return [self.forward(d) for d in datas]

    srv = InferenceServer(SlowIdentity(), max_batch=4, batch_window_ms=50.0)
    try:
        results = [None] * 6
        def hit(i):
            results[i] = srv.predict(dict(clip))
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(r is not None and "pred_depths" in r for r in results)
        assert srv.stats()["served"] == 6
        assert srv.stats()["mean_batch"] > 1.0
    finally:
        srv.close()


def test_core_error_isolation(clip):
    """A model exception fails that request but the server keeps serving."""

    class Flaky(IdentityModel):
        def __init__(self):
            super().__init__()
            self.n = 0

        def forward(self, data):
            self.n += 1
            if self.n == 1:
                raise ValueError("boom")
            return super().forward(data)

    srv = InferenceServer(Flaky(), max_batch=1)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            srv.predict(dict(clip))
        out = srv.predict(dict(clip))
        assert "pred_depths" in out
    finally:
        srv.close()


@pytest.fixture(scope="module")
def http_server():
    srv = HTTPInferenceServer(IdentityModel(), host="127.0.0.1", port=0)
    srv.start()
    yield srv
    srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.port}{path}"


def test_http_health_and_stats(http_server):
    with urllib.request.urlopen(_url(http_server, "/healthz"), timeout=10) as r:
        body = json.loads(r.read())
    assert body == {"status": "ok", "model": "IdentityModel"}
    with urllib.request.urlopen(_url(http_server, "/stats"), timeout=10) as r:
        assert "served" in json.loads(r.read())


def test_http_predict(http_server, clip):
    req = urllib.request.Request(
        _url(http_server, "/v1/predict"),
        data=encode_arrays(_sendable(clip)),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        preds = decode_arrays(r.read())
    assert set(preds) >= {"pred_depths", "pred_normals", "pred_poses"}
    np.testing.assert_allclose(
        preds["pred_depths"], -clip["cam_coord"][:, 2], atol=1e-5
    )


def test_http_bad_request(http_server):
    req = urllib.request.Request(
        _url(http_server, "/v1/predict"), data=b"not an npz", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400
    # server still healthy afterwards
    with urllib.request.urlopen(_url(http_server, "/healthz"), timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------

def test_per_clip_error_isolation(clip):
    """In the per-forward fallback path a bad co-batched request must not
    poison valid ones (regression: one try wrapped the whole batch)."""

    class NoBatch(IdentityModel):
        forward_batch = None  # force the per-clip path

        def forward(self, data):
            import time

            time.sleep(0.05)
            if "poison" in data:
                raise ValueError("bad payload")
            return super().forward(data)

    srv = InferenceServer(NoBatch(), max_batch=4, batch_window_ms=80.0)
    try:
        results = {}
        def hit(i, payload):
            try:
                results[i] = srv.predict(payload)
            except RuntimeError as exc:
                results[i] = exc
        bad = dict(clip); bad["poison"] = np.zeros(1)
        payloads = [dict(clip), bad, dict(clip)]
        threads = [
            threading.Thread(target=hit, args=(i, p))
            for i, p in enumerate(payloads)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert isinstance(results[1], RuntimeError)
        assert "pred_depths" in results[0] and "pred_depths" in results[2]
    finally:
        srv.close()


def test_close_fails_queued_requests(clip):
    """close() must fail queued requests immediately, not strand them."""
    import time

    class Slow(IdentityModel):
        def forward(self, data):
            time.sleep(0.5)
            return super().forward(data)

    srv = InferenceServer(Slow(), max_batch=1)
    errs = []
    def hit():
        try:
            srv.predict(dict(clip), timeout=30.0)
        except (RuntimeError, TimeoutError) as exc:
            errs.append(exc)
    threads = [threading.Thread(target=hit) for _ in range(3)]
    t0 = time.time()
    for t in threads:
        t.start()
    time.sleep(0.1)
    srv.close()
    for t in threads:
        t.join(timeout=10)
    assert time.time() - t0 < 8.0  # nobody waited out a long timeout
    with pytest.raises(RuntimeError):
        srv.predict(dict(clip))  # post-close requests rejected immediately


def test_encode_arrays_keeps_device_arrays(clip):
    """jax.Array predictions must not be silently dropped from responses."""
    import jax.numpy as jnp

    payload = encode_arrays({
        "pred_depths": jnp.ones((2, 4, 4)),
        "pred_scale": 2.5,
        "scene_name": "scene_01",   # unicode arrays round-trip pickle-free
        "skip_me": {"not": "encodable"},  # object dtype → dropped
    })
    back = decode_arrays(payload)
    assert "pred_depths" in back and back["pred_depths"].shape == (2, 4, 4)
    assert back["pred_scale"] == 2.5
    assert back["scene_name"] == "scene_01"
    assert "skip_me" not in back
