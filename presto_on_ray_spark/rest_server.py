"""Presto REST protocol endpoint — the coordinator wire surface.

The reference's presto-cli speaks Presto's public client REST protocol
to the coordinator: ``POST /v1/statement`` with the SQL text as the
body, then follow ``nextUri`` until ``stats.state`` is terminal
(reference presto-mgr.py:268-273 execs that CLI against
``coordinator_host:port``; the protocol itself is documented public
Presto behavior). This module serves that protocol shape over the
engine, so an HTTP client can run Presto-dialect SQL without JDBC:

    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng)          # ephemeral port
    srv.start()
    # POST http://host:port/v1/statement  body: SELECT ...
    # -> {"id", "columns", "data", "nextUri"?, "stats": {"state": ...}}
    srv.stop()

Protocol fidelity (the subset real clients depend on):
- first response carries ``columns`` (name + Presto type rendering)
  and a ``nextUri``; the follow-up page carries ``data`` and the
  FINISHED state — the two-step handshake presto-cli performs;
- errors return ``stats.state = "FAILED"`` plus an ``error`` object
  with ``message``/``errorName`` (the fields the CLI prints);
- DELETE /v1/statement/{id} cancels (drops the buffered result).

Scale stance: like the CLI, this is a human/client window — results
are collected up to ``max_rows`` per query (default 1000), never a
bulk-transfer path (CTAS/INSERT are the egress for that). The server
is a stdlib ThreadingHTTPServer on a daemon thread; statements run on
the request thread against the shared engine session.
"""

from __future__ import annotations

import base64
import collections
import datetime
import json
import math
import threading
import uuid
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import types as T

from presto_on_ray_spark.type_names import presto_type_name

# back-compat alias (tests and engine historically imported from here)
_presto_type = presto_type_name




def _json_value(v):
    """Row value -> Presto's JSON wire rendering."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        # Presto's wire spellings, parseable by Double.parseDouble
        return "NaN" if math.isnan(v) else ("Infinity" if v > 0 else "-Infinity")
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, dict):
        return {str(_json_value(k)): _json_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        # covers Row too (a tuple subclass): Presto renders row values
        # as JSON arrays on the wire, same as arrays
        return [_json_value(x) for x in v]
    return v


class PrestoRestServer:
    """Minimal Presto client-protocol server over an Engine."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 max_rows: int = 1000):
        self.engine = engine
        self.max_rows = max_rows
        # bounded LRU: entries whose nextUri is never followed must not
        # pin memory forever on a long-running server; pages stay until
        # evicted or DELETEd, so nextUri GETs are retryable (the client
        # protocol allows retrying a failed fetch)
        self._results: "collections.OrderedDict[str, dict]" = collections.OrderedDict()
        self._max_buffered = 128
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path.rstrip("/") != "/v1/statement":
                    self._send(404, {"error": {"message": "not found"}})
                    return
                n = int(self.headers.get("Content-Length", "0"))
                sql = self.rfile.read(n).decode("utf-8")
                # nextUri must be client-routable: derive from the Host
                # header (binding to 0.0.0.0 makes self.url useless to
                # remote clients), falling back to the bind address
                host = self.headers.get("Host")
                base = f"http://{host}" if host else outer.url
                self._send(200, outer._submit(sql, base))

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                # /v1/statement/{id}/{page}
                if len(parts) == 4 and parts[:2] == ["v1", "statement"]:
                    self._send(200, outer._page(parts[2]))
                    return
                self._send(404, {"error": {"message": "not found"}})

            def do_DELETE(self):
                parts = self.path.strip("/").split("/")
                if len(parts) >= 3 and parts[:2] == ["v1", "statement"]:
                    with outer._lock:
                        outer._results.pop(parts[2], None)
                    # RFC 9110: 204 carries no content
                    self.send_response(204)
                    self.end_headers()
                    return
                self._send(404, {"error": {"message": "not found"}})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # -- lifecycle ----------------------------------------------------
    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "PrestoRestServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    # -- protocol -----------------------------------------------------
    def _submit(self, sql: str, base_url: str | None = None) -> dict:
        qid = uuid.uuid4().hex[:16]
        try:
            df = self.engine.sql(sql.strip().rstrip(";"))
            if df is None:
                return {
                    "id": qid,
                    "columns": [{"name": "result", "type": "varchar"}],
                    "data": [["OK"]],
                    "stats": {"state": "FINISHED"},
                }
            rows = df.limit(self.max_rows).collect()
            payload = {
                "columns": [
                    {"name": f.name, "type": presto_type_name(f.dataType)}
                    for f in df.schema.fields
                ],
                "data": [[_json_value(v) for v in row] for row in rows],
            }
        except Exception as exc:
            return {
                "id": qid,
                "error": {
                    "message": str(exc).splitlines()[0] if str(exc) else repr(exc),
                    "errorName": type(exc).__name__,
                    "errorCode": 1,
                },
                "stats": {"state": "FAILED"},
            }
        with self._lock:
            self._results[qid] = payload
            while len(self._results) > self._max_buffered:
                self._results.popitem(last=False)
        # first response: columns + nextUri (the presto-cli handshake);
        # the data page follows
        return {
            "id": qid,
            "columns": payload["columns"],
            "nextUri": f"{base_url or self.url}/v1/statement/{qid}/1",
            "stats": {"state": "RUNNING"},
        }

    def _page(self, qid: str) -> dict:
        with self._lock:
            payload = self._results.get(qid)
            if payload is not None:
                self._results.move_to_end(qid)
        if payload is None:
            return {
                "id": qid,
                "error": {"message": f"unknown or finished query: {qid}",
                          "errorName": "NOT_FOUND", "errorCode": 2},
                "stats": {"state": "FAILED"},
            }
        return {
            "id": qid,
            "columns": payload["columns"],
            "data": payload["data"],
            "stats": {"state": "FINISHED"},
        }


def main(argv: list[str] | None = None) -> int:
    """Standalone coordinator-style endpoint:

        python -m presto_on_ray_spark.rest_server \
            --sf-dir /root/testdata/sf0.01 --port 8080
    """
    import argparse

    parser = argparse.ArgumentParser(prog="python -m presto_on_ray_spark.rest_server")
    parser.add_argument("--sf-dir", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max-rows", type=int, default=1000)
    args = parser.parse_args(argv)

    from presto_on_ray_spark.engine import Engine
    from presto_on_ray_spark.session import get_spark

    spark = get_spark(app_name="presto-on-ray-spark-rest")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)
    if args.sf_dir:
        eng.register_tables(args.sf_dir)
    srv = PrestoRestServer(eng, host=args.host, port=args.port,
                           max_rows=args.max_rows)
    print(f"serving Presto REST protocol at {srv.url}/v1/statement")
    try:
        srv._httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
