"""Remote (broker-shaped) ShardLogBackend served over HTTP.

The transport's storage seam (``transport.ShardLogBackend``) has two
in-process implementations — local-FS and in-memory. A real deployment
runs the log on a BROKER: appends, end-offsets, range reads, and group
commits all cross a process/network boundary (reference:
``infra/main.tf:47-124`` provisions Kinesis for exactly this role).
This module is that third implementation, self-contained on the
standard library:

- :class:`ShardLogHTTPServer` / ``python -m …streaming.shardlog_remote``
  — a threaded HTTP server whose storage is the durable
  :class:`~.transport.LocalFSShardLog` (so a restarted server recovers
  the logs and group offsets from disk, like a broker recovering its
  segments). Producer critical sections become server-side LOCK LEASES:
  ``/acquire`` hands out a token that serializes all appenders of a
  shard across every client process; a crashed client's lease expires
  (default 30 s) instead of wedging the shard — the same liveness
  policy as a broker's producer-id timeout.
- :class:`RemoteShardLog` — the client, a drop-in
  :class:`~.transport.ShardLogBackend`. Stream locators are URLs
  (``http://host:port/<stream>``), so the ``record_feed`` Spark source
  reads a remote stream by ``.option("path", locator)`` — the reader
  processes on Spark workers each open their own HTTP connections,
  exactly how executor tasks fetch from a broker.

Atomicity claims and where they are enforced:

- **Append atomicity / per-shard ordering** — the server's lock lease
  serializes appenders; each append lands via the FS backend's
  flock+flush inside one request. Concurrent clients cannot interleave
  bytes (contract-suite-checked across the process boundary).
- **Boundary-aligned end offsets** — delegated to the FS backend's
  newline flooring; the HTTP layer adds no buffering of its own.
- **Immutable replay** — ``read_range`` is a stateless positional read
  of an append-only file.
- **Group-commit validation** — offset range checks run server-side
  against the authoritative log end, then publish atomically through
  the FS backend's lock-and-rename; ``ValueError`` round-trips to the
  client as HTTP 400 and is re-raised as ``ValueError``.

The contract suite (`tests/test_transport.py::TestRemoteShardLog`) runs
this backend through a REAL subprocess server, and
``streaming_remote_transport_replay`` drives a full produce → Spark
streaming drain → replay cycle against it with an exact DuckDB oracle.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from deathmetal_datalake_spark.streaming.transport import (
    LocalFSShardLog,
    ShardAppender,
    ShardLogBackend,
)

_DEFAULT_LEASE_S = 30.0


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------


class _LeaseTable:
    """Per-(stream, shard) exclusive leases with expiry — the server-side
    realization of ``ShardLogBackend.exclusive`` for remote producers."""

    def __init__(self, lease_s: float = _DEFAULT_LEASE_S):
        self._cv = threading.Condition()
        self._held: dict[tuple[str, int], tuple[str, float]] = {}
        self.lease_s = lease_s

    def acquire(self, stream: str, shard: int, timeout: float = 60.0) -> str:
        key = (stream, shard)
        deadline = time.monotonic() + timeout
        with self._cv:
            while True:
                now = time.monotonic()
                held = self._held.get(key)
                if held is None or held[1] <= now:  # free or lease expired
                    token = uuid.uuid4().hex
                    self._held[key] = (token, now + self.lease_s)
                    return token
                if now >= deadline:
                    raise TimeoutError(f"shard {key} lease not released")
                self._cv.wait(timeout=min(0.5, deadline - now))

    def validate(self, stream: str, shard: int, token: str) -> None:
        key = (stream, shard)
        with self._cv:
            held = self._held.get(key)
            if held is None or held[0] != token:
                raise PermissionError(f"stale or unknown lease for shard {key}")
            if held[1] <= time.monotonic():
                raise PermissionError(f"lease expired for shard {key}")
            # Touch: an active appender keeps its lease alive.
            self._held[key] = (token, time.monotonic() + self.lease_s)

    def release(self, stream: str, shard: int, token: str) -> None:
        key = (stream, shard)
        with self._cv:
            held = self._held.get(key)
            if held is not None and held[0] == token:
                del self._held[key]
                self._cv.notify_all()


class ShardLogHTTPServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, root: str, lease_s: float = _DEFAULT_LEASE_S):
        super().__init__(addr, _Handler)
        self.inner = LocalFSShardLog(root)
        self.leases = _LeaseTable(lease_s)


class _Handler(BaseHTTPRequestHandler):
    server: ShardLogHTTPServer

    def log_message(self, *args) -> None:  # keep stdout clean for PORT=
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:
        if self.path == "/health":
            self._json(200, {"ok": True})
        else:
            self._json(404, {"error": "unknown endpoint"})

    def do_POST(self) -> None:
        n = int(self.headers.get("Content-Length", "0"))
        try:
            req = json.loads(self.rfile.read(n) or b"{}")
            out = self._dispatch(self.path, req)
            self._json(200, out)
        except ValueError as exc:
            self._json(400, {"error": str(exc), "kind": "ValueError"})
        except FileNotFoundError as exc:
            self._json(404, {"error": str(exc), "kind": "FileNotFoundError"})
        except PermissionError as exc:
            self._json(409, {"error": str(exc), "kind": "PermissionError"})
        except TimeoutError as exc:
            self._json(423, {"error": str(exc), "kind": "TimeoutError"})
        except Exception as exc:  # surface, don't hide, server bugs
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})

    def _dispatch(self, path: str, req: dict) -> dict:
        inner, leases = self.server.inner, self.server.leases
        if path == "/ensure_stream":
            inner.ensure_stream(req["stream"], int(req["n_shards"]))
            return {"stream": req["stream"]}
        if path == "/n_shards":
            return {"n": inner.n_shards(req["stream"])}
        if path == "/end_offset":
            return {"end": inner.end_offset(req["stream"], int(req["shard"]))}
        if path == "/read_range":
            blob = inner.read_range(
                req["stream"], int(req["shard"]), int(req["start"]), int(req["end"])
            )
            return {"b64": base64.b64encode(blob).decode()}
        if path == "/acquire":
            token = leases.acquire(req["stream"], int(req["shard"]))
            return {"token": token}
        if path == "/release":
            leases.release(req["stream"], int(req["shard"]), req["token"])
            return {}
        if path in ("/size", "/append", "/last_record"):
            stream, shard = req["stream"], int(req["shard"])
            # Fast-fail before taking the flock (cheap rejection of
            # stale tokens without contending on the file lock).
            leases.validate(stream, shard, req["token"])
            # Each call takes the local flock for its own duration: the
            # lease provides cross-client exclusion, the flock protects
            # against non-HTTP writers sharing the same directory.
            with inner.exclusive(stream, shard) as log:
                # FENCING (ADVICE r5): re-validate while HOLDING the
                # flock, immediately before the mutation. A request
                # stalled past its lease (e.g. blocked on this very
                # flock) would otherwise append after another client
                # legitimately took the lease over — the takeover's own
                # appends serialize through the same flock, so the
                # stale holder always observes its replaced/expired
                # token here and is rejected at write time.
                leases.validate(stream, shard, req["token"])
                if path == "/size":
                    return {"size": log.size()}
                if path == "/append":
                    end = log.append(base64.b64decode(req["b64"]))
                    return {"end": end}
                last = log.last_record()
                return {"b64": None if last is None else base64.b64encode(last).decode()}
        if path == "/committed_offsets":
            offs = inner.committed_offsets(req["stream"], req["group"])
            return {"offsets": {str(k): v for k, v in offs.items()}}
        if path == "/commit_offsets":
            inner.commit_offsets(
                req["stream"],
                req["group"],
                {int(k): int(v) for k, v in req["offsets"].items()},
            )
            return {}
        raise FileNotFoundError(f"unknown endpoint {path}")


def serve(root: str, port: int = 0, lease_s: float = _DEFAULT_LEASE_S) -> None:
    """Run the server until killed; prints ``PORT=<n>`` (then a blank
    flush) on stdout so a parent process can discover an ephemeral port."""
    srv = ShardLogHTTPServer(("127.0.0.1", port), root, lease_s)
    print(f"PORT={srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()


def main() -> None:
    ap = argparse.ArgumentParser(description="Serve a shard-log root over HTTP")
    ap.add_argument("--root", required=True)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--lease-seconds", type=float, default=_DEFAULT_LEASE_S)
    args = ap.parse_args()
    serve(args.root, args.port, args.lease_seconds)


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class _RemoteAppender(ShardAppender):
    def __init__(self, backend: "RemoteShardLog", stream: str, shard: int, token: str):
        self._b = backend
        self._stream = stream
        self._shard = shard
        self._token = token

    def _call(self, endpoint: str, **extra) -> dict:
        return self._b._call(
            endpoint,
            stream=self._stream,
            shard=self._shard,
            token=self._token,
            **extra,
        )

    def size(self) -> int:
        return self._call("/size")["size"]

    def append(self, record: bytes) -> int:
        return self._call("/append", b64=base64.b64encode(record).decode())["end"]

    def last_record(self) -> Optional[bytes]:
        b64 = self._call("/last_record")["b64"]
        return None if b64 is None else base64.b64decode(b64)


class RemoteShardLog(ShardLogBackend):
    """HTTP client for :class:`ShardLogHTTPServer` — a drop-in
    :class:`~.transport.ShardLogBackend` whose every operation crosses
    a process boundary. Stream locators are ``http://host:port/<name>``;
    bare stream names resolve against the client's base URL, so the
    producer SDK and the ``record_feed`` reader both work unchanged."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    # -- plumbing ----------------------------------------------------------

    def _split(self, stream: str) -> str:
        """Locator URL → bare stream name (the client always talks to
        its own base_url; a locator from another server resolves to the
        same-named stream here, as with broker bootstrap lists)."""
        if stream.startswith("http://") or stream.startswith("https://"):
            parsed = urllib.parse.urlparse(stream)
            return parsed.path.strip("/")
        return stream

    def _call(self, endpoint: str, **payload) -> dict:
        if "stream" in payload:
            payload["stream"] = self._split(payload["stream"])
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            self.base_url + endpoint,
            data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            try:
                err = json.loads(exc.read())
            except Exception:
                err = {"error": str(exc)}
            kind = err.get("kind")
            msg = err.get("error", str(exc))
            if kind == "ValueError":
                raise ValueError(msg) from None
            if kind == "FileNotFoundError":
                raise FileNotFoundError(msg) from None
            if kind == "PermissionError":
                raise PermissionError(msg) from None
            if kind == "TimeoutError":
                raise TimeoutError(msg) from None
            raise RuntimeError(f"shardlog server error: {msg}") from None

    # -- ShardLogBackend ---------------------------------------------------

    def ensure_stream(self, stream: str, n_shards: int) -> str:
        name = self._call("/ensure_stream", stream=stream, n_shards=n_shards)[
            "stream"
        ]
        return f"{self.base_url}/{name}"

    def n_shards(self, stream: str) -> int:
        return self._call("/n_shards", stream=stream)["n"]

    def end_offset(self, stream: str, shard: int) -> int:
        return self._call("/end_offset", stream=stream, shard=shard)["end"]

    def read_range(self, stream: str, shard: int, start: int, end: int) -> bytes:
        b64 = self._call(
            "/read_range", stream=stream, shard=shard, start=start, end=end
        )["b64"]
        return base64.b64decode(b64)

    @contextmanager
    def exclusive(self, stream: str, shard: int):
        token = self._call("/acquire", stream=stream, shard=shard)["token"]
        try:
            yield _RemoteAppender(self, stream, shard, token)
        finally:
            self._call("/release", stream=stream, shard=shard, token=token)

    def committed_offsets(self, stream: str, group: str) -> dict[int, int]:
        offs = self._call("/committed_offsets", stream=stream, group=group)[
            "offsets"
        ]
        return {int(k): int(v) for k, v in offs.items()}

    def commit_offsets(self, stream: str, group: str, offsets: dict[int, int]) -> None:
        self._call(
            "/commit_offsets",
            stream=stream,
            group=group,
            offsets={str(k): int(v) for k, v in offsets.items()},
        )


# ---------------------------------------------------------------------------
# Subprocess harness (tests + the oracle-checked replay query)
# ---------------------------------------------------------------------------


class ShardLogServerProcess:
    """Spawn ``python -m …shardlog_remote`` serving ``root`` on an
    ephemeral port; context-managed so tests/queries always reap it."""

    def __init__(self, root: str, lease_s: float = _DEFAULT_LEASE_S):
        self.root = root
        self.lease_s = lease_s
        self.proc = None
        self.base_url: Optional[str] = None

    def __enter__(self) -> "ShardLogServerProcess":
        import subprocess

        self.proc = subprocess.Popen(
            [
                sys.executable,
                "-m",
                "deathmetal_datalake_spark.streaming.shardlog_remote",
                "--root",
                self.root,
                "--port",
                "0",
                "--lease-seconds",
                str(self.lease_s),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            cwd=os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            text=True,
        )
        line = self.proc.stdout.readline().strip()
        if not line.startswith("PORT="):
            self.proc.kill()
            raise RuntimeError(f"shardlog server failed to start: {line!r}")
        self.base_url = f"http://127.0.0.1:{line[5:]}"
        # Readiness: the PORT line prints after bind, so /health succeeds
        # immediately; one probe verifies the HTTP stack end-to-end.
        with urllib.request.urlopen(self.base_url + "/health", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True
        return self

    def __exit__(self, *exc) -> None:
        if self.proc is not None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=10)
            except Exception:
                self.proc.kill()


if __name__ == "__main__":
    main()
