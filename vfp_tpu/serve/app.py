"""HTTP layer: stdlib ThreadingHTTPServer exposing the reference API surface.

Endpoints (reference: api/main.py:255-936):
    GET  /                 -> upload page
    GET  /upload           -> upload page
    POST /upload           -> process video (multipart 'file')
    POST /start-view       -> JSON {username, num_copies?} -> view session
    GET  /view             -> player page
    GET  /view/{view_id}   -> per-view m3u8
    GET  /hls/{filename}   -> segment/playlist files (CORS + no-cache)
    GET  /download-view/{view_id} -> spliced per-view video file
    POST /detect           -> multipart leaked segment -> matching usernames
    GET  /view-history     -> JSON

FastAPI/uvicorn are not available in this environment; the stdlib server
keeps the layer dependency-free (jinja2 renders the small HTML pages).
"""

from __future__ import annotations

import json
import logging
import re
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from .service import VfpService
from .templates import render_page

logger = logging.getLogger(__name__)


def parse_multipart(body: bytes, content_type: str) -> dict:
    """Minimal multipart/form-data parser: returns {name: (filename, bytes)}."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("no multipart boundary")
    boundary = m.group(1).encode()
    parts = body.split(b"--" + boundary)
    out = {}
    for part in parts:
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        head, _, data = part.partition(b"\r\n\r\n")
        head_text = head.decode("utf-8", "replace")
        name_m = re.search(r'name="([^"]*)"', head_text)
        file_m = re.search(r'filename="([^"]*)"', head_text)
        if name_m:
            out[name_m.group(1)] = (file_m.group(1) if file_m else None, data)
    return out


def make_handler(service: VfpService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s %s", self.address_string(), fmt % args)

        # -- helpers -------------------------------------------------------
        def _send(self, code: int, body: bytes, ctype: str, extra=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code: int = 200):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _html(self, text: str, code: int = 200):
            self._send(code, text.encode(), "text/html; charset=utf-8")

        def _read_body(self) -> bytes:
            length = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(length)

        # -- GET -------------------------------------------------------------
        def do_GET(self):
            try:
                path = self.path.split("?")[0]
                if path in ("/", "/upload"):
                    return self._html(render_page("upload"))
                if path == "/view":
                    return self._html(render_page("view"))
                if path == "/detect":
                    return self._html(render_page("detect"))
                if path == "/view-history":
                    return self._json(service.view_history())
                if path.startswith("/view/"):
                    view_id = path[len("/view/") :]
                    try:
                        m3u8 = service.view_playlist(view_id)
                    except KeyError:
                        return self._json({"error": "view not found"}, 404)
                    return self._send(
                        200, m3u8.encode(), "application/vnd.apple.mpegurl",
                        {"Cache-Control": "no-cache"},
                    )
                if path.startswith("/hls/"):
                    name = Path(path[len("/hls/") :]).name
                    f = service.hls_dir / name
                    if not f.exists():
                        return self._json({"error": "not found"}, 404)
                    data = f.read_bytes()
                    ctype = (
                        "application/vnd.apple.mpegurl"
                        if name.endswith(".m3u8")
                        else "video/mp4" if name.endswith((".m4s", ".mp4"))
                        else "application/octet-stream"
                    )
                    return self._send(200, data, ctype, {"Cache-Control": "no-cache"})
                if path.startswith("/download-view/"):
                    view_id = path[len("/download-view/") :]
                    try:
                        f = service.download_view(view_id)
                    except KeyError:
                        return self._json({"error": "view not found"}, 404)
                    return self._send(
                        200, f.read_bytes(), "video/mp4",
                        {"Content-Disposition": f'attachment; filename="{f.name}"'},
                    )
                return self._json({"error": "not found"}, 404)
            except Exception as e:  # pragma: no cover
                logger.exception("GET %s failed", self.path)
                return self._json({"error": str(e)}, 500)

        # -- POST --------------------------------------------------------------
        def do_POST(self):
            try:
                path = self.path.split("?")[0]
                body = self._read_body()
                parts = None
                if path in ("/upload", "/detect"):
                    try:
                        parts = parse_multipart(
                            body, self.headers.get("Content-Type", ""))
                    except ValueError as e:  # no/garbled boundary: client error
                        return self._json({"detail": str(e)}, 400)
                if path == "/start-view":
                    data = json.loads(body or b"{}")
                    try:
                        return self._json(
                            service.start_view(data.get("username"), data.get("num_copies"))
                        )
                    except ValueError as e:
                        return self._json({"detail": str(e)}, 400)
                    except FileNotFoundError as e:
                        return self._json({"detail": str(e)}, 404)
                if path == "/upload":
                    if "file" not in parts:
                        return self._json({"detail": "file field required"}, 400)
                    fname, data = parts["file"]
                    suffix = Path(fname or "upload.mp4").suffix or ".mp4"
                    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
                        f.write(data)
                        tmp = f.name
                    try:
                        return self._json(service.process_upload(tmp))
                    except OSError as e:
                        # undecodable/corrupt media is a client error
                        return self._json({"detail": str(e)}, 400)
                    finally:
                        Path(tmp).unlink(missing_ok=True)
                if path == "/detect":
                    if "file" not in parts:
                        return self._json({"detail": "file field required"}, 400)
                    fname, data = parts["file"]
                    suffix = Path(fname or "leaked.mp4").suffix or ".mp4"
                    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
                        f.write(data)
                        tmp = f.name
                    try:
                        return self._json(service.detect(tmp))
                    except OSError as e:
                        return self._json({"detail": str(e)}, 400)
                    finally:
                        Path(tmp).unlink(missing_ok=True)
                return self._json({"error": "not found"}, 404)
            except Exception as e:  # pragma: no cover
                logger.exception("POST %s failed", self.path)
                return self._json({"error": str(e)}, 500)

    return Handler


def make_server(host: str, port: int, data_dir, **kw) -> ThreadingHTTPServer:
    service = VfpService(data_dir, **kw)
    return ThreadingHTTPServer((host, port), make_handler(service))


def run_server(host: str = "0.0.0.0", port: int = 8000, data_dir: str = "serve_data", **kw):
    srv = make_server(host, port, data_dir, **kw)
    logger.info("serving on http://%s:%d (data dir %s)", host, port, data_dir)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
