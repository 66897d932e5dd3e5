"""Standalone multi-host HTTP server for the live-fetch bench tier.

Runs as a SUBPROCESS (``python -m boris_spark.synth.liveserver <portfile>
<logfile> <pages_per_host>``) so its Python threads don't share the GIL
with the Spark driver while 32 executor tasks hammer it. Serves a
deterministic binary-tree web per host: the "host" is whichever loopback
address the client targeted (127.0.0.0/8 — every address resolves
locally, and each is a distinct politeness host to the crawl engine).
Every request appends ``<host> <monotonic_ts>`` to *logfile* — the
per-host request-spacing evidence the bench reports.
"""

from __future__ import annotations

import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(pages_per_host: int, log_fh, lock):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):  # noqa: N802
            host = self.headers.get("Host", "?").split(":")[0]
            with lock:
                log_fh.write(f"{host} {time.monotonic():.4f}\n")
            try:
                i = int(self.path.rsplit("/", 1)[-1])
            except ValueError:
                i = -1
            if not (0 <= i < pages_per_host):
                body = b""
                self.send_response(404)
            else:
                links = "".join(
                    f"<td class='title'><a href='/p/{c}'>d{c}</a></td>"
                    for c in (2 * i + 1, 2 * i + 2) if c < pages_per_host
                )
                body = (
                    f"<html><head><title>{host} p{i}</title></head><body>"
                    f"<p>page {i} of {host} body text</p>{links}"
                    f"</body></html>"
                ).encode()
                self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    return Handler


class _Server(ThreadingHTTPServer):
    request_queue_size = 1024  # burst = hosts × budget concurrent fetches
    daemon_threads = True


def main(portfile: str, logfile: str, pages_per_host: int) -> None:
    lock = threading.Lock()
    with open(logfile, "w", buffering=1) as log_fh:
        srv = _Server(
            ("0.0.0.0", 0), make_handler(pages_per_host, log_fh, lock)
        )
        with open(portfile, "w") as f:
            f.write(str(srv.server_port))
        srv.serve_forever()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
