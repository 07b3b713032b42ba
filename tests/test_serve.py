"""HTTP service tests: real server on an ephemeral port, driven via urllib."""

import json
import threading
import urllib.request
import uuid

import numpy as np
import pytest

from vfp_tpu.io import RawVideoWriter
from vfp_tpu.serve.app import make_server

from test_dwt_dct_svd import natural_frames


def _req(base, path, data=None, headers=None, method=None):
    req = urllib.request.Request(
        base + path, data=data, headers=headers or {}, method=method
    )
    with urllib.request.urlopen(req) as r:
        return r.status, r.read(), dict(r.headers)


def _multipart(field, filename, payload):
    boundary = uuid.uuid4().hex
    body = (
        f"--{boundary}\r\nContent-Disposition: form-data; "
        f'name="{field}"; filename="{filename}"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
    return body, {"Content-Type": f"multipart/form-data; boundary={boundary}"}


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("serve")
    srv = make_server("127.0.0.1", 0, data_dir, num_copies=2, segment_duration=1.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, data_dir
    srv.shutdown()


@pytest.fixture(scope="module")
def uploaded(server, tmp_path_factory):
    base, data_dir = server
    rng = np.random.RandomState(21)
    src = tmp_path_factory.mktemp("vid") / "src.rawv"
    with RawVideoWriter(src, 96, 64, fps=6) as w:
        w.write_batch(natural_frames(rng, b=12, h=64, w=96))
    body, headers = _multipart("file", "src.rawv", src.read_bytes())
    status, resp, _ = _req(base, "/upload", body, headers, "POST")
    assert status == 200
    return json.loads(resp)


class TestPages:
    def test_html_pages(self, server):
        base, _ = server
        for path in ("/", "/upload", "/view", "/detect"):
            status, body, _ = _req(base, path)
            assert status == 200 and b"<html>" in body

    def test_missing_view_404(self, server):
        base, _ = server
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(base, "/view/nonexistent")
        assert e.value.code == 404

    def test_player_url_rewriting_transport(self, server):
        """The viewer page must carry the reference player's URL-rewriting
        transport (reference: api/templates/index.html:152-166): .m4s
        requests reroute to /hls/<name>, master.m3u8 refetches reroute to
        /view/<id>, with bounded-retry config, media-error recovery, the
        native-HLS fallback, and the per-view download button."""
        base, _ = server
        _, body, _ = _req(base, "/view")
        page = body.decode()
        for marker in (
            "xhrSetup",
            "url.endsWith('.m4s')",
            "'/hls/' + url.split('/').pop()",
            "url.includes('master.m3u8')",
            "'/view/' + currentViewId",
            "maxLoadingRetry: 3",
            "recoverMediaError",
            "startLoad",
            "canPlayType('application/vnd.apple.mpegurl')",
            "MANIFEST_PARSED",
            "/download-view/",
            "displayWatermarkPatterns",
            "hls.js",
        ):
            assert marker in page, f"player page missing {marker!r}"

    def test_detect_page_renders_match_fields(self, server):
        """Detect page renders the reference's per-match fields
        (reference: api/templates/detect.html:119-137)."""
        base, _ = server
        _, body, _ = _req(base, "/detect")
        page = body.decode()
        for marker in ("Username", "Timestamp", "Pattern", "Segment Number",
                       "Confidence", "m.frequency * 100", "/detect"):
            assert marker in page, f"detect page missing {marker!r}"

    def test_detect_page_escapes_untrusted_fields(self, server):
        """Usernames are attacker-chosen at /start-view; the detect page must
        HTML-escape them (and error/note) before innerHTML, or a crafted
        username executes script in the investigator's browser (stored XSS —
        the reference template has this flaw, advisor finding r2)."""
        base, _ = server
        _, body, _ = _req(base, "/detect")
        page = body.decode()
        assert "const esc" in page
        # every string-concat interpolation of an untrusted field must go
        # through esc(...); a bare `+ field` means raw HTML injection
        for field in ("m.username", "data.error", "data.note"):
            assert f"esc({field}" in page, f"{field} never escaped"
            assert f"+ {field}" not in page, f"{field} interpolated unescaped"
            assert f"+{field}" not in page, f"{field} interpolated unescaped"

    def test_upload_page_has_copies_field(self, server):
        base, _ = server
        _, body, _ = _req(base, "/upload")
        assert b'name="copies"' in body and b'type="file"' in body


class TestWorkflow:
    def test_upload_processed(self, uploaded):
        assert uploaded["status"] == "success"
        assert uploaded["num_segments"] == 2
        assert uploaded["total_variants"] == 4

    def test_start_view_and_playlists(self, server, uploaded):
        base, _ = server
        views = []
        for name in ("alice", "bob", "carol"):
            status, resp, _ = _req(
                base, "/start-view",
                json.dumps({"username": name}).encode(),
                {"Content-Type": "application/json"}, "POST",
            )
            assert status == 200
            views.append(json.loads(resp))
        assert [v["view_number"] for v in views] == [0, 1, 2]
        # per-view playlists select distinct variant sequences
        playlists = []
        for v in views:
            status, m3u8, _ = _req(base, f"/view/{v['view_id']}")
            assert status == 200
            assert m3u8.startswith(b"#EXTM3U")
            playlists.append(m3u8)
        assert len(set(playlists)) == 3
        # view 1 (base-2 pattern [0,1]) plays seg0 copy0 + seg1 copy1
        assert b"marked_seg000_copy0" in playlists[1]
        assert b"marked_seg001_copy1" in playlists[1]

    def test_hls_files_served(self, server, uploaded):
        base, data_dir = server
        status, data, headers = _req(base, "/hls/playlist.m3u8")
        assert status == 200
        name = next(f.name for f in (data_dir / "hls").iterdir() if "copy" in f.name)
        status, seg, _ = _req(base, f"/hls/{name}")
        assert status == 200 and len(seg) > 1000

    def test_detect_identifies_viewer(self, server, uploaded):
        base, data_dir = server
        # leak: bob's (view 1, pattern [0,1]) segment 1 = copy 1
        leaked = next(
            f for f in (data_dir / "hls").iterdir() if "seg001_copy1" in f.name
        )
        body, headers = _multipart("file", leaked.name, leaked.read_bytes())
        status, resp, _ = _req(base, "/detect", body, headers, "POST")
        data = json.loads(resp)
        assert data["status"] == "success", data
        assert data["segment_number"] == 1 and data["copy_index"] == 1
        users = {m["username"] for m in data["matches"]}
        assert "bob" in users and "alice" not in users
        # API/UI contract: every field the detect page dereferences per match
        # card (templates.py: m.username / m.timestamp / m.payload.join /
        # m.segment_number / m.frequency; reference api/main.py:652-659)
        # must be present and well-typed, or the page throws and the
        # investigator sees an error instead of the matched users.
        for m in data["matches"]:
            assert isinstance(m["username"], str)
            assert isinstance(m["timestamp"], str) and m["timestamp"]
            assert isinstance(m["payload"], list) and m["payload"]
            assert all(isinstance(b, int) for b in m["payload"])
            assert isinstance(m["segment_number"], int)
            assert isinstance(m["copy_index"], int)
            assert isinstance(m["frequency"], float) and 0.0 < m["frequency"] <= 1.0
        bob = next(m for m in data["matches"] if m["username"] == "bob")
        assert bob["segment_number"] == 1 and bob["copy_index"] == 1
        assert bob["payload"] == data["pattern"]

    def test_download_view(self, server, uploaded):
        base, _ = server
        status, resp, _ = _req(base, "/view-history")
        history = json.loads(resp)
        vid = next(k for k, v in history.items() if v["username"] == "alice")
        status, data, headers = _req(base, f"/download-view/{vid}")
        assert status == 200 and len(data) > 1000


class TestServeAudio:
    def test_upload_with_audio_download_keeps_it(self, tmp_path):
        """Full service chain on an A/V source: upload -> per-segment mark ->
        start-view -> /download-view returns an .mp4 whose audio equals the
        source's, bitwise (no-ffmpeg audio passthrough, VERDICT r3 item 4)."""
        import cv2

        from vfp_tpu.io.ffmpeg import have_ffmpeg
        from vfp_tpu.io.mp4 import add_audio_track, read_mp4, slice_track_by_time
        from vfp_tpu.serve.service import VfpService

        if have_ffmpeg():
            pytest.skip("container has ffmpeg; this covers the fallback")
        rng = np.random.RandomState(5)
        src = tmp_path / "src.mp4"
        w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"mp4v"), 6, (64, 48))
        for f in np.repeat(np.repeat(
                rng.randint(0, 255, (12, 6, 8, 3), dtype=np.uint8), 8, 1), 8, 2):
            w.write(f)
        w.release()
        ref_audio = slice_track_by_time(
            read_mp4("/root/reference/tests/media/in.mp4").audio(), 0.0, 2.0)
        add_audio_track(src, ref_audio)

        def track_bytes(t):
            out = b""
            for s in t.samples:
                with open(s.src, "rb") as f:
                    f.seek(s.offset)
                    out += f.read(s.size)
            return out

        want = track_bytes(read_mp4(src).audio())
        svc = VfpService(tmp_path / "data", num_copies=2, segment_duration=1.0)
        svc.process_upload(src)
        view = svc.start_view("mallory")
        out = svc.download_view(view["view_id"])
        assert out.suffix == ".mp4"
        got = read_mp4(out).audio()
        assert got is not None
        assert track_bytes(got) == want


class TestFailureFallback:
    def test_bad_segment_falls_back_to_unmarked(self, tmp_path, rng):
        """A segment that fails to mark is served unmarked (reference:
        api/main.py:141-162) and recorded in failed_segments.json."""
        import json
        from vfp_tpu.serve.service import VfpService
        from vfp_tpu.io import RawVideoWriter

        svc = VfpService(tmp_path / "data", num_copies=2, segment_duration=1.0)
        src = tmp_path / "src.rawv"
        with RawVideoWriter(src, 96, 64, fps=6) as w:
            w.write_batch(natural_frames(rng, b=12, h=64, w=96))
        segs_dir = tmp_path / "data" / "segments"
        # process normally first to build segments, then corrupt one and redo
        svc.process_upload(src)
        # corrupt segment 1 and re-run the marking stage with fallback
        segs = sorted(segs_dir.iterdir())
        segs[1].write_bytes(b"garbage not a video")
        marked, payloads, copies, failed = svc._mark_with_fallback(segs)
        assert len(failed) == 1 and failed[0]["segment_number"] == 1
        assert copies["total_marked_segments"] == 4  # 2 segs x 2 copies
        # the fallback files exist (unmarked copies)
        names = [m.file for m in marked if m.segment_number == 1]
        assert len(names) == 2
        for n in names:
            assert (tmp_path / "data" / "marked_segments" / n.split("/")[-1]).exists()


class TestConcurrency:
    def test_parallel_start_views_unique_numbers(self, server, uploaded):
        """Concurrent /start-view must assign distinct view numbers."""
        import concurrent.futures

        base, _ = server

        def start(i):
            status, resp, _ = _req(
                base, "/start-view",
                json.dumps({"username": f"user{i}"}).encode(),
                {"Content-Type": "application/json"}, "POST",
            )
            return json.loads(resp)["view_number"]

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            numbers = list(pool.map(start, range(8)))
        assert len(set(numbers)) == 8, numbers


class TestBadUploads:
    """Undecodable media is a client error (400), and a failed upload must
    not destroy the previously served video's state."""

    def test_garbage_upload_400_and_state_preserved(self, server, uploaded):
        base, data_dir = server
        before = (data_dir / "segment_mapping.json").read_text()
        body, headers = _multipart("file", "evil.mp4", b"\x00garbage" * 512)
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(base, "/upload", body, headers, "POST")
        assert e.value.code == 400
        assert json.loads(e.value.read())["detail"]
        # previous video still fully served
        assert (data_dir / "segment_mapping.json").read_text() == before
        status, _, _ = _req(base, "/view")
        assert status == 200

    def test_garbage_detect_400(self, server, uploaded):
        base, _ = server
        body, headers = _multipart("file", "leak.mp4", b"not video" * 99)
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(base, "/detect", body, headers, "POST")
        assert e.value.code == 400

    def test_missing_boundary_400(self, server):
        base, _ = server
        for path in ("/upload", "/detect"):
            with pytest.raises(urllib.error.HTTPError) as e:
                _req(base, path, b"no boundary here",
                     {"Content-Type": "multipart/form-data"}, "POST")
            assert e.value.code == 400
