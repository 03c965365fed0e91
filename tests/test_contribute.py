"""Distributed contribute client tests against a local stub server
(cpp/distributed/client.{h,cpp} protocol)."""

import gzip
import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import jax
import jax.numpy as jnp
import pytest

from katago_tpu.distributed.client import ClientError, Connection, ModelInfo


def _make_model_bytes():
    """A real tiny exported model so the full contribute path can load it."""
    from katago_tpu.models import config as MC
    from katago_tpu.models import export as E
    from katago_tpu.models.model import KataGoModel
    import tempfile, os
    cfg = MC.get_config("b1c6")
    m = KataGoModel(cfg, pos_len=5, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 5, 22)),
                    jnp.zeros((1, 19)))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.bin.gz")
        E.export_model(params, cfg, path, name="stub-model")
        return open(path, "rb").read()


MODEL_BYTES = None


class StubHandler(BaseHTTPRequestHandler):
    uploads = []

    def log_message(self, *a):
        pass

    def _send(self, code, body, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.end_headers()
        self.wfile.write(body if isinstance(body, bytes)
                         else json.dumps(body).encode())

    def do_GET(self):
        if self.path == "/api/users/me/":
            self._send(200, {"username": "tester"})
        elif self.path == "/models/stub.bin.gz":
            self._send(200, MODEL_BYTES, "application/octet-stream")
        else:
            self._send(404, {})

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n)) if n else {}
        if self.path == "/api/tasks/":
            self._send(200, {
                "id": "t1", "kind": "selfplay", "run": {"name": "testrun"},
                "network": {
                    "name": "stub",
                    "model_file": "/models/stub.bin.gz",
                    "model_file_sha256":
                        hashlib.sha256(MODEL_BYTES).hexdigest(),
                },
            })
        elif self.path == "/api/games/training/":
            StubHandler.uploads.append(body)
            self._send(200, {"ok": True})
        else:
            self._send(404, {})


@pytest.fixture(scope="module")
def server():
    global MODEL_BYTES
    MODEL_BYTES = _make_model_bytes()
    srv = HTTPServer(("127.0.0.1", 0), StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_connection_and_task(server):
    conn = Connection(server, "u", "p", max_tries=2)
    me = conn.test_connection()
    assert me["username"] == "tester"
    task = conn.get_next_task()
    assert task.task_id == "t1" and not task.is_rating_task
    assert task.model_black.name == "stub"


def test_model_download_sha_verified(server, tmp_path):
    conn = Connection(server, "u", "p", max_tries=2)
    task = conn.get_next_task()
    path = conn.download_model_if_not_present(task.model_black,
                                              str(tmp_path))
    assert path.endswith("stub.bin.gz")
    assert conn.is_model_present(task.model_black, str(tmp_path))
    # corrupted hash raises
    bad = ModelInfo(name="bad", url="/models/stub.bin.gz",
                    sha256="0" * 64)
    with pytest.raises(ClientError):
        conn.download_model_if_not_present(bad, str(tmp_path))


def test_full_contribute_task(server, tmp_path):
    from katago_tpu.cli.contribute_cmd import run_one_task
    conn = Connection(server, "u", "p", max_tries=2)
    task = conn.get_next_task()
    resp = run_one_task(conn, task, str(tmp_path), size=5, visits=8,
                        games=2, log=lambda *_: None)
    assert resp["ok"]
    assert StubHandler.uploads
    up = StubHandler.uploads[-1]
    assert up["task_id"] == "t1" and up["num_rows"] > 0
    assert len(up["npz_b64"]) > 100
