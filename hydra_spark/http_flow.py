"""Live HTTP ingest endpoint — Hydra's V2 REST entry point, served.

Hydra's primary entry point is ``POST /v2/topics/{topic}/records``
(reference: ingest/src/main/scala/hydra.ingest/http/
IngestionEndpoint.scala:52-76; status mapping :89-96,130-175). The
engine already implements the *semantics* table-driven
(``ingest_flow.ingest_requests``: one row per request in, a typed
record + IngestionReport row out); this module adds the live-socket
form so a user of the reference can point the same HTTP client at this
engine:

  * ``IngestHttpServer`` — a stdlib ``ThreadingHTTPServer`` accepting
    ``POST /v2/topics/{topic}/records``. Each request is answered
    SYNCHRONOUSLY with the reference's status mapping (200 OK /
    400 InvalidRequest / 413 RecordTooLarge) and spooled — response
    status included — as a JSON line for the streaming side.
  * The spool directory is a Structured Streaming file source: files
    appear atomically (tmp + rename), so ``spark.readStream.json`` can
    tail it with exactly-once file-source semantics. At cluster scale
    the same server fronts a distributed log instead of a local spool —
    the Spark plan is identical (the source swaps).
  * ``requests_stream`` / ``requests_batch`` read the spool and re-run
    the SAME admission pipeline JVM-side via ``ingest_requests``. The
    handler's synchronous verdict and the engine's distributed verdict
    are computed independently — ``status_parity`` joins them so any
    divergence (a request the handler accepted but the engine rejects,
    or vice versa) is a visible row, and the certification row pins
    parity == 100% over deterministic fixture traffic.

The synchronous checks mirror ``ingest_flow`` exactly: size admission
first (serialized bytes, not characters), then JSON well-formedness
(object payloads; a valid document with trailing garbage is ACCEPTED
because Spark's ``from_json`` accepts it — handler/engine parity beats
strictness), then key presence when the destination is keyed.
"""

from __future__ import annotations

import json
import os
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession, functions as F

from hydra_spark.ingest_flow import BAD_REQUEST, OK, TOO_LARGE, ingest_requests

_PATH_RE = re.compile(r"^/v2/topics/([A-Za-z0-9._-]+)/records$")

# the synchronous handler mirrors get_json_object for PLAIN dotted paths
# only; bracketed/indexed JsonPath ($.items[0].id) or exotic field names
# would silently diverge from the engine verdict, so they are refused
# loudly at server construction
_KEY_PATH_RE = re.compile(r"^\$\.[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")

# Absolute wire-size ceiling, enforced BEFORE the body is read: a forged
# multi-GB Content-Length must not buffer unbounded memory in the
# handler thread (same adversarial-input class as the Avro decoder's
# forged block counts — see functions/avro_wire.py). Requests refused
# here are never spooled, so the parity certification row is unaffected;
# the configured per-record ``max_bytes`` (reference semantics,
# RecordTooLarge after decode) still runs through spool + parity.
MAX_WIRE_BYTES = 64 * 1024 * 1024

# spool line schema (what the server writes, what Spark reads)
SPOOL_SCHEMA = (
    "correlation_id STRING, topic STRING, payload STRING, "
    "http_status INT, recv_seq LONG"
)


def _sync_verdict(payload: str | None, key_path: str | None, max_bytes: int | None) -> int:
    """The handler's synchronous admission verdict — the same check
    order as ``ingest_requests`` (size -> json -> key), expressed in
    pure Python so the response does not wait on a Spark job. Parity
    with the engine verdict is pinned by ``status_parity``."""
    if payload is None:
        return BAD_REQUEST
    if max_bytes is not None and len(payload.encode("utf-8")) > max_bytes:
        return TOO_LARGE
    try:
        # raw_decode, not loads: Spark's from_json accepts a valid JSON
        # document with trailing garbage (parity with the engine verdict
        # beats strictness here — the trailing bytes are dropped by both)
        doc, _ = json.JSONDecoder().raw_decode(payload.strip())
    except ValueError:
        return BAD_REQUEST
    if not isinstance(doc, dict):
        # from_json with a struct schema treats scalar/array JSON as
        # malformed; the handler must agree
        return BAD_REQUEST
    if key_path is not None:
        cur: object = doc
        for part in key_path[2:].split("."):
            if not isinstance(cur, dict) or part not in cur or cur[part] is None:
                return BAD_REQUEST
            cur = cur[part]
    return OK


class IngestHttpServer:
    """Threaded live endpoint; spools every answered request.

    One JSON-lines spool file per ``flush()`` (tmp + rename, atomic for
    the Spark file source); ``auto_flush_every`` bounds request-to-file
    latency without a timer thread (the Nth request flushes)."""

    def __init__(
        self,
        spool_dir: str,
        key_path: str | None = None,
        max_bytes: int | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        auto_flush_every: int = 64,
    ) -> None:
        if key_path is not None and not _KEY_PATH_RE.match(key_path):
            raise ValueError(
                f"key_path {key_path!r} is not a plain dotted JsonPath "
                "($.a.b); the synchronous handler cannot mirror it"
            )
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.key_path = key_path
        self.max_bytes = max_bytes
        self.auto_flush_every = auto_flush_every
        self._buf: list[dict] = []
        self._lock = threading.Lock()
        self._seq = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # stdlib default logs every request to stderr; a server
            # embedded in a test/driver run must stay quiet
            def log_message(self, *a):  # noqa: D102
                pass

            def do_POST(self):  # noqa: N802 (stdlib casing)
                m = _PATH_RE.match(self.path)
                if not m:
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                except ValueError:
                    n = -1
                if n < 0:
                    self.close_connection = True
                    self.send_response(400)
                    self.end_headers()
                    return
                if n > MAX_WIRE_BYTES:
                    # refuse before reading — and close: the client is
                    # still mid-send, so the connection can't be reused
                    self.close_connection = True
                    self.send_response(413)
                    self.end_headers()
                    return
                body = self.rfile.read(n).decode("utf-8", errors="replace")
                corr = self.headers.get("hydra-correlation-id") or uuid.uuid4().hex[:12]
                status = _sync_verdict(body, outer.key_path, outer.max_bytes)
                outer._spool(corr, m.group(1), body, status)
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(
                    json.dumps({"correlationId": corr, "status": status}).encode()
                )

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.address = f"http://{self._httpd.server_address[0]}:{self._httpd.server_address[1]}"
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def _spool(self, corr: str, topic: str, payload: str, status: int) -> None:
        with self._lock:
            self._buf.append(
                {
                    "correlation_id": corr,
                    "topic": topic,
                    "payload": payload,
                    "http_status": status,
                    "recv_seq": self._seq,
                }
            )
            self._seq += 1
            if len(self._buf) >= self.auto_flush_every:
                self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buf:
            return
        name = f"spool-{self._seq:012d}-{uuid.uuid4().hex[:8]}.json"
        tmp = os.path.join(self.spool_dir, "." + name + ".tmp")
        with open(tmp, "w") as f:
            for row in self._buf:
                f.write(json.dumps(row) + "\n")
        os.rename(tmp, os.path.join(self.spool_dir, name))
        self._buf.clear()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def close(self) -> None:
        self.flush()
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)


def requests_batch(spark: SparkSession, spool_dir: str) -> DataFrame:
    return spark.read.schema(SPOOL_SCHEMA).json(spool_dir)


def requests_stream(spark: SparkSession, spool_dir: str) -> DataFrame:
    """File-source tail of the spool — the production shape. File-source
    exactly-once + a downstream idempotent sink gives the same
    end-to-end guarantee as the flagship's parquet replay path."""
    return spark.readStream.schema(SPOOL_SCHEMA).json(spool_dir)


def status_parity(
    spooled: DataFrame,
    value_schema: str,
    key_path: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Re-run admission engine-side over the spooled requests and join
    the handler's synchronous verdict against the engine's distributed
    one. Output: one row per request with both statuses and an
    ``agree`` flag — the certification row asserts sum(agree) == count.
    """
    engine = ingest_requests(
        spooled.select("correlation_id", "payload"),
        value_schema,
        key_path=key_path,
        max_bytes=max_bytes,
    ).select("correlation_id", F.col("status_code").alias("engine_status"), "key", "value")
    return (
        spooled.select("correlation_id", "topic", "http_status", "recv_seq")
        .join(engine, "correlation_id")
        .select(
            "correlation_id",
            "topic",
            "recv_seq",
            "http_status",
            "engine_status",
            (F.col("http_status") == F.col("engine_status")).cast("int").alias("agree"),
        )
    )
