"""Local fake-S3 for the conditional-PUT commit-backend tests: a
stdlib ThreadingHTTPServer speaking exactly the subset the client
uses — PUT with ``If-None-Match: *`` (200 create / 412 exists, the
check-and-create atomic under one lock, matching S3's documented
conditional-write semantics), plain PUT overwrite, GET (200/404)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _Handler(BaseHTTPRequestHandler):
    def do_PUT(self):  # noqa: N802 (http.server API)
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        srv = self.server
        with srv.lock:
            if self.headers.get("If-None-Match") == "*" and self.path in srv.store:
                self.send_response(412, "Precondition Failed")
                self.end_headers()
                return
            srv.store[self.path] = body
        self.send_response(200)
        self.send_header("ETag", '"%d"' % len(body))
        self.end_headers()

    def do_GET(self):  # noqa: N802
        body = self.server.store.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence request logging in tests
        pass


class FakeS3Server:
    """Context manager: ``with FakeS3Server() as srv: srv.endpoint``."""

    def __init__(self):
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._httpd.store = {}
        self._httpd.lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def endpoint(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    @property
    def store(self) -> dict:
        return self._httpd.store

    def __enter__(self) -> "FakeS3Server":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
