"""Processor facade parity (reference src/processor.ts:29-89,135-161)."""

from __future__ import annotations

import pytest

from hive_processor_spark.processor import (
    Processor,
    UnknownCommand,
    run_serial,
    run_serial_ignore,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def proc(spark):
    return Processor(spark, SF_SMALL)


def test_registry_prepopulated_from_engine(proc):
    assert "agg_groupby" in proc.commands()
    assert len(proc.commands()) >= 120


def test_dispatch_runs_registered_query(proc):
    assert proc.run_job("agg_groupby").count() == 6


def test_last_registration_wins(proc, spark):
    # reference src/processor.ts:57-59 — Map.set overwrites
    proc.call("probe", lambda s, d: s.range(3).toDF("n"))
    proc.call("probe", lambda s, d: s.range(5).toDF("n"))
    assert proc.run_job("probe").count() == 5


def test_unknown_cmd_raises(proc):
    # reference logs-and-drops (src/processor.ts:85-87); in-process we raise
    with pytest.raises(UnknownCommand):
        proc.run_job("no_such_cmd")


def test_run_serial_fail_fast():
    ran = []

    def ok(i):
        return lambda: ran.append(i) or i

    def boom():
        raise ValueError("x")

    with pytest.raises(ValueError):
        run_serial([ok(1), ok(2), boom, ok(3)])
    assert ran == [1, 2]  # aborted at the failure, in order


def test_run_serial_ignore_skips_failures():
    errs = []

    def boom():
        raise ValueError("x")

    out = run_serial_ignore(
        [lambda: 1, boom, lambda: 3], on_error=errs.append
    )
    assert out == [1, 3]
    assert len(errs) == 1


def test_remote_query_roundtrip(spark):
    """The reference's reason to exist is remote callers (envelope in,
    sn-correlated rows out, zlib sniffed — src/processor.ts:92-133). Prove
    the capability: a SECOND PROCESS with no Spark on its import path calls
    a registered query over the serving socket and receives exactly the
    rows the in-process run produces."""
    import json
    import subprocess
    import sys
    import textwrap

    from hive_processor_spark import queries
    from hive_processor_spark.serving import QueryServer

    with QueryServer(spark) as srv:
        client = textwrap.dedent(
            f"""
            import json, socket, struct, zlib
            def msg(body, compress):
                raw = json.dumps(body).encode()
                if compress:
                    raw = zlib.compress(raw)
                return struct.pack(">I", len(raw)) + raw
            def read(conn):
                n = struct.unpack(">I", conn.recv(4))[0]
                buf = b""
                while len(buf) < n:
                    buf += conn.recv(n - len(buf))
                if buf[:1] == b"\\x78":
                    buf = zlib.decompress(buf)
                return json.loads(buf)
            conn = socket.create_connection(("127.0.0.1", {srv.port}), timeout=120)
            # compressed request -> compressed, sn-correlated reply
            conn.sendall(msg({{"sn": 7, "query": "agg_groupby",
                               "sf_dir": "{SF_SMALL}"}}, True))
            print(json.dumps(read(conn)))
            # error path: unknown query must reply, not kill the server
            conn.sendall(msg({{"sn": 8, "query": "nope", "sf_dir": "x"}}, False))
            print(json.dumps(read(conn)))
            conn.close()
            """
        )
        out = subprocess.run(
            [sys.executable, "-c", client],
            capture_output=True,
            text=True,
            timeout=180,
        )
    assert out.returncode == 0, out.stderr[-2000:]
    reply_ok, reply_err = (json.loads(line) for line in out.stdout.splitlines())

    assert reply_ok["sn"] == 7 and reply_ok["ok"] is True
    in_proc = [
        json.loads(s)
        for s in queries()["agg_groupby"](spark, SF_SMALL).toJSON().collect()
    ]
    key = lambda r: json.dumps(r, sort_keys=True)  # noqa: E731
    assert sorted(reply_ok["rows"], key=key) == sorted(in_proc, key=key)

    assert reply_err["sn"] == 8 and reply_err["ok"] is False
    assert "unknown query" in reply_err["error"]


def test_remote_concurrent_clients(spark):
    """Two clients connected at once must both get correct, sn-correlated
    answers — thread-per-connection serving, with Spark scheduling the
    overlapping jobs (the reference solved this with a worker pool,
    src/processor.ts:36-55)."""
    import json
    import threading

    from hive_processor_spark.serving import QueryServer, request_once

    results: dict[int, dict] = {}

    with QueryServer(spark) as srv:
        def call(sn: int) -> None:
            results[sn] = request_once(
                "127.0.0.1",
                srv.port,
                {"sn": sn, "query": "agg_global", "sf_dir": SF_SMALL},
                compress=sn % 2 == 0,
            )

        threads = [threading.Thread(target=call, args=(sn,)) for sn in (1, 2, 3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
    assert set(results) == {1, 2, 3}
    for sn, reply in results.items():
        assert reply["ok"] and reply["sn"] == sn
        assert reply["rows"][0]["n_rows"] > 0
    assert len({json.dumps(r["rows"]) for r in results.values()}) == 1


def test_remote_pipelined_interleaved(spark):
    """One connection PIPELINES six requests (all written before any reply
    is read) while a second client hammers a different query concurrently —
    replies must come back sn-correlated in request order, each mirroring
    its own request's compression, with errors interleaved mid-stream
    without desynchronizing the framing (the pool-of-2 + sn-correlation
    semantics of the reference, src/processor.ts:36-55,92-133)."""
    import json
    import socket
    import threading

    from hive_processor_spark.serving import (
        QueryServer,
        _read_msg,
        _write_msg,
        request_once,
    )

    with QueryServer(spark) as srv:
        side: dict[int, dict] = {}

        def other_client() -> None:
            for sn in (101, 102):
                side[sn] = request_once(
                    "127.0.0.1",
                    srv.port,
                    {"sn": sn, "query": "agg_groupby", "sf_dir": SF_SMALL},
                    compress=sn % 2 == 0,
                )

        t = threading.Thread(target=other_client)
        t.start()

        # sn → (query, compress); sn 13 is a mid-stream error probe
        plan = [
            (11, "agg_global", False),
            (12, "agg_global", True),
            (13, "no_such_query", False),
            (14, "filter_compare", True),
            (15, "agg_global", False),
            (16, "agg_global", True),
        ]
        with socket.create_connection(("127.0.0.1", srv.port), timeout=180) as conn:
            for sn, q, comp in plan:  # write ALL before reading ANY
                _write_msg(conn, {"sn": sn, "query": q, "sf_dir": SF_SMALL}, comp)
            replies = []
            for _ in plan:
                msg = _read_msg(conn)
                assert msg is not None
                replies.append(msg)
        t.join(timeout=180)

    # in-order, sn-correlated, compression mirrored per message
    assert [r[0]["sn"] for r in replies] == [sn for sn, _, _ in plan]
    assert [r[1] for r in replies] == [comp for _, _, comp in plan]
    by_sn = {r[0]["sn"]: r[0] for r in replies}
    assert by_sn[13]["ok"] is False and "unknown query" in by_sn[13]["error"]
    for sn in (11, 12, 15, 16):
        assert by_sn[sn]["ok"] is True and by_sn[sn]["rows"][0]["n_rows"] > 0
    assert by_sn[11]["rows"] == by_sn[15]["rows"]
    assert by_sn[14]["ok"] is True and len(by_sn[14]["rows"]) > 0

    # the concurrent client saw its own correct, correlated answers
    assert set(side) == {101, 102}
    for sn, reply in side.items():
        assert reply["ok"] and reply["sn"] == sn and len(reply["rows"]) > 0
    assert side[101]["rows"] == side[102]["rows"]


def test_remote_tenant_ctx_scopes_query(spark):
    """The reference envelope's multi-tenant request context
    (``ctx: {domain, ip, uid}``, src/processor.ts:98-106) must reach the
    handler and scope its scan: two callers sending different ``ctx.domain``
    values over the SAME registered query get disjoint, tenant-local
    answers, and a ctx-less call falls back to the registry default (the
    oracle's pinned tenant)."""
    from hive_processor_spark import queries
    from hive_processor_spark.serving import QueryServer, request_once

    name = "scan_tenant_prune"
    with QueryServer(spark) as srv:
        r_a = request_once(
            srv.host,
            srv.port,
            {
                "sn": 21,
                "query": name,
                "sf_dir": SF_SMALL,
                "ctx": {"domain": "src3", "uid": "tenant-a", "ip": "10.0.0.3"},
            },
        )
        r_b = request_once(
            srv.host,
            srv.port,
            {
                "sn": 22,
                "query": name,
                "sf_dir": SF_SMALL,
                "ctx": {"domain": "src11", "uid": "tenant-b"},
            },
        )
        r_default = request_once(
            srv.host, srv.port, {"sn": 23, "query": name, "sf_dir": SF_SMALL}
        )
    assert r_a["ok"] and r_b["ok"] and r_default["ok"]
    # tenant isolation: same query, different domains, different answers
    assert r_a["rows"] != r_b["rows"]

    import json as _json

    def in_proc(ctx):
        fn = queries()[name]
        df = fn(spark, SF_SMALL, ctx=ctx) if ctx else fn(spark, SF_SMALL)
        return [_json.loads(s) for s in df.toJSON().collect()]

    assert r_a["rows"] == in_proc({"domain": "src3"})
    assert r_b["rows"] == in_proc({"domain": "src11"})
    assert r_default["rows"] == in_proc(None)  # oracle-pinned src7 default
