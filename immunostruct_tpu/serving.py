"""Batch serving over an exported StableHLO artifact.

The reference has no serving path (its closest analog is the batch
inference script, /root/reference/infer_IEDB_or_Cancer.py:97-104, which
re-instantiates the full torch stack); here the deterministic inference
function is exported once (`utils/export.py`, `cli/export_model.py`) and
served without any model code via ``jax.export.deserialize(...).call``.

Two stdlib-only transports (no web framework):

1. A filesystem request queue: requests are ``.npz`` files with the
   exported function's inputs; responses are written next to them as
   ``<name>.probs.npy``.
2. An HTTP scoring endpoint (``--http PORT``): ``POST /score`` with the
   same ``.npz`` bytes as the request body returns
   ``{"probs": [...], "ms": t}``; ``GET /healthz`` answers liveness.

Request npz keys (shapes must match the exported signature):
  node_feat [B,N,20] coords [B,N,3] edge_src/edge_dst [B,E] edge_feat
  [B,E,1] edge_mask [B,E]->bool node_mask [B,N]->bool, num_nodes,
  seq [B,L,21], props [B,2]
(produce one with ``--write-example``)

Measured serving numbers live in benchmarks/RESULTS.md ("Serving /
inference"): 26-31k pMHC/s batch throughput on the v5e chip; the
single-sample program executes in 0.14 ms of device time (the 1.4-2.2 ms
steady-state wall observed in this environment is remote-dispatch
tunnel overhead).

Usage (also exposed as ``python -m immunostruct_tpu.cli.serve``):
  ... --artifact model.shlo --watch-dir q/        # filesystem queue
  ... --artifact model.shlo --oneshot req.npz     # score one file
  ... --artifact model.shlo --http 8788           # HTTP endpoint
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def request_to_args(path):
    """Parse a request ``.npz`` (path or file-like) into call args."""
    import jax.numpy as jnp
    from immunostruct_tpu.structs import GraphBatch

    with np.load(path) as z:
        graph = GraphBatch(
            node_feat=jnp.asarray(z["node_feat"]),
            coords=jnp.asarray(z["coords"]),
            edge_src=jnp.asarray(z["edge_src"]),
            edge_dst=jnp.asarray(z["edge_dst"]),
            edge_feat=jnp.asarray(z["edge_feat"]),
            edge_mask=jnp.asarray(z["edge_mask"]),
            node_mask=jnp.asarray(z["node_mask"]),
            num_nodes=jnp.asarray(z["num_nodes"]),
        )
        return graph, jnp.asarray(z["seq"]), jnp.asarray(z["props"])


def write_example(path: str, batch=8, nodes=32, edges=128, seq_len=64):
    rng = np.random.default_rng(0)
    onehot = np.zeros((batch, nodes, 20), np.float32)
    onehot[:, np.arange(nodes), rng.integers(0, 20, (batch, nodes))] = 1.0
    np.savez(path,
             node_feat=onehot,
             coords=rng.standard_normal((batch, nodes, 3)).astype(np.float32),
             edge_src=rng.integers(0, nodes, (batch, edges)).astype(np.int32),
             edge_dst=rng.integers(0, nodes, (batch, edges)).astype(np.int32),
             edge_feat=np.ones((batch, edges, 1), np.float32),
             edge_mask=np.ones((batch, edges), bool),
             node_mask=np.ones((batch, nodes), bool),
             num_nodes=np.full((batch,), nodes, np.int32),
             seq=rng.random((batch, seq_len, 21)).astype(np.float32),
             props=rng.random((batch, 2)).astype(np.float32))


def serve_one(exported, req_path: str) -> str:
    args = request_to_args(req_path)
    t0 = time.perf_counter()
    probs = np.asarray(exported.call(*args))
    dt = (time.perf_counter() - t0) * 1e3
    out_path = req_path[: -len(".npz")] + ".probs.npy"
    np.save(out_path, probs)
    print(f"{os.path.basename(req_path)}: {probs.shape[0]} probs in "
          f"{dt:.1f} ms -> {out_path}")
    return out_path


def make_http_server(exported, host: str = "127.0.0.1", port: int = 0):
    """HTTP scoring endpoint over the exported artifact (stdlib only).

    POST /score with ``.npz`` request bytes → ``{"probs": [...], "ms": t}``
    (400 with an ``error`` field on a malformed request); GET /healthz →
    ``{"status": "ok"}``. Returns the ``HTTPServer`` (not started) so
    callers/tests pick the bound port via ``server_address`` and drive
    ``serve_forever``/``shutdown`` themselves. Single-threaded by design:
    one accelerator, one request at a time — concurrency belongs in the
    caller's batching, which the latency curve shows is nearly free
    (benchmarks/RESULTS.md serving section).
    """
    import io
    import json
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/score":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                args = request_to_args(io.BytesIO(self.rfile.read(n)))
                t0 = time.perf_counter()
                probs = np.asarray(exported.call(*args))
                ms = (time.perf_counter() - t0) * 1e3
            except Exception as e:  # malformed npz, wrong shapes, ...
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                return
            # success reply OUTSIDE the try: a client that disconnects
            # mid-write must not be answered with a second reply on the
            # dead socket (and a write error is not a 400-class request
            # problem)
            try:
                self._reply(200, {"probs": probs.tolist(),
                                  "ms": round(ms, 3)})
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away; nothing to send it

        def log_message(self, fmt, *a):  # quiet; responses carry the info
            pass

    return HTTPServer((host, port), Handler)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", type=str)
    ap.add_argument("--watch-dir", type=str)
    ap.add_argument("--oneshot", type=str)
    ap.add_argument("--write-example", type=str)
    ap.add_argument("--poll-secs", type=float, default=0.2)
    ap.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve POST /score + GET /healthz on this port "
                         "instead of watching a directory")
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--platform", type=str, default=None,
                    help="force the jax platform (e.g. 'cpu') — must match "
                         "the platform the artifact was exported for. Set "
                         "here at the Python level because an ambient "
                         "sitecustomize may import jax before JAX_PLATFORMS "
                         "is honored")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.write_example:
        write_example(args.write_example)
        print(f"wrote example request {args.write_example}")
        if not args.artifact:
            return

    if not args.artifact:
        ap.error("--artifact is required (except with --write-example alone)")

    from immunostruct_tpu.utils.export import load_exported

    exported = load_exported(args.artifact)

    if args.oneshot:
        serve_one(exported, args.oneshot)
        return

    if args.http is not None:
        server = make_http_server(exported, args.host, args.http)
        host, port = server.server_address[:2]
        print(f"scoring at http://{host}:{port}/score (ctrl-c to stop)")
        server.serve_forever()
        return

    if not args.watch_dir:
        ap.error("one of --watch-dir, --oneshot, or --http is required")
    print(f"serving from {args.watch_dir} (ctrl-c to stop)")
    # processed state is keyed by (name, size, mtime): a request that failed
    # because the poll caught it mid-copy is RETRIED once the writer
    # finishes (its size/mtime changes); a genuinely bad file is rejected
    # once per version, not re-spammed every poll
    done = set()
    while True:
        for fname in sorted(os.listdir(args.watch_dir)):
            if not fname.endswith(".npz"):
                continue
            path = os.path.join(args.watch_dir, fname)
            try:
                st = os.stat(path)
            except OSError:
                continue
            key = (fname, st.st_size, st.st_mtime_ns)
            if key in done:
                continue
            try:
                serve_one(exported, path)
            except Exception as e:  # noqa: BLE001 - keep serving on bad requests
                print(f"REJECTED {fname} (will retry if the file changes): {e}")
            done.add(key)
        time.sleep(args.poll_secs)
