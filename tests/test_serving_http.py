"""HTTP scoring endpoint over the exported artifact (immunostruct_tpu/serving.py).

The reference has no serving path at all; this pins the transport layer
added on top of the StableHLO export (utils/export.py): POST /score with
request-npz bytes returns the same probabilities as calling the artifact
directly, /healthz answers, and malformed bodies get a 400 with an error
instead of killing the server.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from immunostruct_tpu.models import build_model
from immunostruct_tpu.utils.export import export_inference_fn

from immunostruct_tpu.serving import (
    make_http_server, request_to_args, write_example,
)


@pytest.fixture(scope="module")
def server_and_artifact(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serving")
    req_path = str(tmp / "req.npz")
    write_example(req_path)  # B=8, N=32, E=128, L=64
    example = request_to_args(req_path)
    seq_len = example[1].shape[1]
    spec, params = build_model("HybridModelv2", seq_len * 21, jax.random.key(0))
    exported = export_inference_fn(spec, params, example, aggregation="onehot")

    server = make_http_server(exported)  # port 0 = ephemeral
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    try:
        yield f"http://{host}:{port}", req_path, exported, example
    finally:
        server.shutdown()
        thread.join(timeout=5)


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(server_and_artifact):
    base, *_ = server_and_artifact
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        assert resp.status == 200
        assert json.loads(resp.read()) == {"status": "ok"}


def test_score_matches_direct_call(server_and_artifact):
    base, req_path, exported, example = server_and_artifact
    status, payload = _post(base + "/score", open(req_path, "rb").read())
    assert status == 200
    want = np.asarray(exported.call(*example))
    got = np.asarray(payload["probs"], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert payload["ms"] > 0


def test_malformed_request_is_400_and_server_survives(server_and_artifact):
    base, req_path, _, _ = server_and_artifact
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/score", b"this is not an npz")
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())
    # server still answers after the bad request
    status, _ = _post(base + "/score", open(req_path, "rb").read())
    assert status == 200


def test_unknown_path_is_404(server_and_artifact):
    base, *_ = server_and_artifact
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/nope", b"")
    assert ei.value.code == 404
