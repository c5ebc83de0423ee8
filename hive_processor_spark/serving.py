"""Remote serving entry point — call a registered query from another process.

The reference engine exists to be *called*: a socket envelope arrives, a
``sn``-correlated reply carries the rows back, and requests may arrive
zlib-compressed (the reference sniffs and inflates before decoding;
reference ``src/processor.ts:92-133``). This module closes that capability
for the Spark engine without inheriting the reference's wire stack
(nanomsg/msgpack are implementation choices, not semantics):

* transport: TCP, each message a big-endian ``uint32`` length prefix plus a
  JSON body — the simplest self-describing envelope two processes in any
  language can speak;
* request: ``{"sn": int, "query": str, "sf_dir": str, "limit": int?,
  "ctx": {"domain": str?, "uid": str?, "ip": str?}?}`` — ``ctx`` mirrors the
  reference's multi-tenant request context (``src/processor.ts:98-106``);
  handlers that declare a ``ctx`` parameter receive it and scope their scan
  to the caller's tenant (``scan_tenant_prune`` turns ``ctx.domain`` into a
  partition-column predicate, SURVEY §1.2 row 11), handlers that don't are
  tenant-agnostic and ``ctx`` passes over them harmlessly;
* response: ``{"sn": <echoed>, "ok": bool, "rows": [...]}`` on success,
  ``{"sn": <echoed>, "ok": false, "error": str}`` on failure — errors
  travel to the caller instead of killing the server (the reference's
  catch-and-reply, ``src/processor.ts:118-126``);
* compression: a request body MAY be zlib-deflated; the server sniffs the
  0x78 leading byte and mirrors the request's encoding in its reply.

Scale posture: this is a *control-plane* door, not a data plane — results
stream back as JSON rows and are expected to be aggregates/top-k (the same
contract the reference's msgpack replies had). Bulk egress belongs in a
sink (``sink_parquet_roundtrip``), not an RPC reply. The server itself is a
thin accept-loop in the driver; query execution stays fully distributed.

Production deployments would front the same registry with Spark Connect
(``sc://host:port``) for a typed, multiplexed client; this module keeps the
smoke-testable zero-dependency path.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import zlib

from pyspark.sql import SparkSession

from hive_processor_spark.engine import ensure_session_confs
from hive_processor_spark.engine import queries as _registered

_LEN = struct.Struct(">I")
_MAX_MSG = 64 * 1024 * 1024  # 64 MiB envelope cap — a control plane, not a sink


def _recv_exact(conn: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _read_msg(conn: socket.socket) -> tuple[dict, bool] | None:
    """One length-prefixed message; returns (body, was_compressed)."""
    header = _recv_exact(conn, _LEN.size)
    if header is None:
        return None
    (length,) = _LEN.unpack(header)
    if length > _MAX_MSG:
        raise ValueError(f"envelope too large: {length}")
    raw = _recv_exact(conn, length)
    if raw is None:
        return None
    compressed = raw[:1] == b"\x78"  # zlib header sniff, reference-style
    if compressed:
        raw = zlib.decompress(raw)
    return json.loads(raw.decode("utf-8")), compressed


def _write_msg(conn: socket.socket, body: dict, compress: bool) -> None:
    raw = json.dumps(body, separators=(",", ":")).encode("utf-8")
    if compress:
        raw = zlib.compress(raw)
    conn.sendall(_LEN.pack(len(raw)) + raw)


class QueryServer:
    """Serve the query registry to other processes over TCP.

    The owning process holds the SparkSession; clients need only a socket
    (no Spark, no Python even). ``port=0`` binds an ephemeral port exposed
    as ``.port`` — the test-friendly default.
    """

    def __init__(
        self, spark: SparkSession, host: str = "127.0.0.1", port: int = 0
    ) -> None:
        ensure_session_confs(spark)
        self._spark = spark
        self._functions = dict(_registered())
        self._sock = socket.create_server((host, port))
        self._sock.settimeout(0.2)  # poll for stop flag
        self.host, self.port = self._sock.getsockname()[:2]
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._serve, name="hps-query-server", daemon=True
        )

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "QueryServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)
        self._sock.close()

    def __enter__(self) -> "QueryServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- serving -----------------------------------------------------------
    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            # Thread-per-connection: concurrent remote callers each get a
            # handler; Spark sessions run concurrent actions safely (the
            # scheduler interleaves jobs), so two clients' queries overlap
            # instead of queueing behind one socket. The reference's worker
            # pooling (src/processor.ts:36-55) solved the same problem with
            # processes.
            threading.Thread(
                target=self._serve_conn_closing, args=(conn,), daemon=True
            ).start()

    def _serve_conn_closing(self, conn: socket.socket) -> None:
        with conn:
            self._serve_conn(conn)

    def _serve_conn(self, conn: socket.socket) -> None:
        while not self._stop.is_set():
            try:
                msg = _read_msg(conn)
            except (ValueError, OSError, json.JSONDecodeError, zlib.error):
                return
            if msg is None:
                return
            request, compressed = msg
            _write_msg(conn, self._handle(request), compressed)

    def _handle(self, request: dict) -> dict:
        sn = request.get("sn")
        try:
            name = request["query"]
            fn = self._functions.get(name)
            if fn is None:
                raise KeyError(f"unknown query: {name!r}")
            ctx = request.get("ctx")
            if ctx is not None and not isinstance(ctx, dict):
                raise TypeError("ctx must be an object")
            ctx_applied = bool(ctx) and self._accepts_ctx(fn)
            if ctx_applied:
                df = fn(self._spark, request["sf_dir"], ctx=ctx)
            else:
                df = fn(self._spark, request["sf_dir"])
            limit = int(request.get("limit", 1000))
            # toJSON keeps types self-describing (dates/timestamps/arrays)
            # without a hand-rolled serializer on either side.
            rows = [json.loads(s) for s in df.limit(limit).toJSON().collect()]
            reply = {"sn": sn, "ok": True, "rows": rows}
            if ctx:
                # ADVICE r5 #2: a tenant-scoped caller must be able to TELL
                # whether its ctx actually scoped the query — a handler
                # without a ctx parameter runs unscoped, and silently
                # returning global data would be an isolation gap.
                reply["ctx_applied"] = ctx_applied
            return reply
        except Exception as exc:  # error → reply, server stays up
            return {"sn": sn, "ok": False, "error": f"{type(exc).__name__}: {exc}"}

    @staticmethod
    def _accepts_ctx(fn) -> bool:
        """True if the handler opted into the request context by declaring
        a ``ctx`` parameter — the serving analog of the reference handlers
        reading ``job.ctx`` (``src/processor.ts:98-106``). Cached on the
        function: signature inspection is per-registration, not per-call."""
        cached = getattr(fn, "_hps_accepts_ctx", None)
        if cached is None:
            import inspect

            try:
                cached = "ctx" in inspect.signature(fn).parameters
            except (TypeError, ValueError):
                cached = False
            try:
                fn._hps_accepts_ctx = cached
            except AttributeError:
                pass
        return cached


def request_once(
    host: str, port: int, body: dict, *, compress: bool = False
) -> dict:
    """Minimal client: one request, one correlated reply (blocking).

    Importable without Spark — this is what a non-Spark process uses.
    """
    with socket.create_connection((host, port), timeout=120) as conn:
        _write_msg(conn, body, compress)
        msg = _read_msg(conn)
        if msg is None:
            raise ConnectionError("server closed connection")
        reply, _ = msg
        if reply.get("sn") != body.get("sn"):
            raise ValueError(f"sn mismatch: sent {body.get('sn')}, got {reply.get('sn')}")
        return reply
