"""Business logic of the fingerprinting service (transport-agnostic).

Mirrors the reference FastAPI app's behaviour (reference: api/main.py):
upload -> segment -> N watermarked variants per segment -> per-view playlist
assembly (view_number in base-num_copies), view_history.json persistence,
and leak detection that maps a leaked segment back to usernames.

The serving path does zero media computation per view — fingerprinting is
playlist text assembly over pre-marked variants (reference property,
SURVEY.md §3.5).
"""

from __future__ import annotations

import json
import logging
import shutil
import uuid
from datetime import datetime
from pathlib import Path

import numpy as np

from ..fingerprint import (
    mark_segments,
    pattern_for_view,
    segment_video,
    decode_segment_copy,
)
from ..fingerprint.hls import write_hls_playlists, _media_playlist
from ..fingerprint.marker import _read_all
from ..pipeline import FrameExtractor
from ..wm import DeShuffler, DwtDctSvd

logger = logging.getLogger(__name__)


class VfpService:
    def __init__(self, data_dir, num_copies: int = 3, segment_duration: float = 2.0, key: int = 0):
        import threading

        self.data_dir = Path(data_dir)
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.num_copies = num_copies
        self.segment_duration = segment_duration
        self.key = key
        self.codec = DwtDctSvd()
        # ThreadingHTTPServer handles requests concurrently; view_history.json
        # updates are read-modify-write and must be serialized.
        self._history_lock = threading.Lock()

    # -- paths ---------------------------------------------------------------
    @property
    def hls_dir(self) -> Path:
        return self.data_dir / "hls"

    @property
    def history_file(self) -> Path:
        return self.data_dir / "view_history.json"

    @property
    def mapping_file(self) -> Path:
        return self.data_dir / "segment_mapping.json"

    def _load_history(self) -> dict:
        if self.history_file.exists():
            return json.loads(self.history_file.read_text())
        return {}

    def _load_mapping(self) -> dict:
        if not self.mapping_file.exists():
            raise FileNotFoundError("No processed video found. Please upload a video first.")
        return json.loads(self.mapping_file.read_text())

    # -- upload / processing ---------------------------------------------------
    def process_upload(self, video_path) -> dict:
        """Segment + mark num_copies variants per segment + build HLS dir.

        Returns a summary dict; writes segment_mapping.json in the API flavor
        (reference: api/main.py:62-214 'successful_segments')."""
        # Validate the input decodes BEFORE wiping the previous video's
        # state — an undecodable upload must not take down the served HLS.
        from ..io import open_reader

        open_reader(video_path).close()
        for d in ("segments", "marked_segments"):
            p = self.data_dir / d
            if p.exists():
                shutil.rmtree(p)
        segments = segment_video(
            video_path, self.data_dir / "segments", self.segment_duration
        )
        marked, payloads, copies, failed = self._mark_with_fallback(segments)
        master, playlist, seg_map, variants = write_hls_playlists(
            marked, self.hls_dir, copies=self.num_copies,
            segment_duration=self.segment_duration,
        )
        successful = {}
        for m in marked:
            name = next(k for k, v in seg_map.items() if v == Path(m.file).name)
            successful[name] = {
                "segment_number": m.segment_number,
                "copy_index": m.copy_index,
                "payload": m.payload,
                "file_path": str(self.hls_dir / name),
            }
        self.mapping_file.write_text(
            json.dumps(
                {
                    "successful_segments": successful,
                    "num_copies": self.num_copies,
                    "description": "Maps segment numbers to their watermarked versions",
                },
                indent=2,
            )
        )
        (self.data_dir / "segment_payloads.json").write_text(json.dumps(payloads, indent=2))
        (self.data_dir / "segment_copies.json").write_text(json.dumps(copies, indent=2))
        if failed:
            (self.data_dir / "failed_segments.json").write_text(json.dumps(failed, indent=2))
        return {
            "status": "success",
            "num_segments": len(segments),
            "num_copies": self.num_copies,
            "total_variants": len(marked),
            "failed_segments": failed,
        }

    def _mark_with_fallback(self, segments):
        """Mark per segment, falling back to unmarked copies on embed failure
        (reference: api/main.py:141-162 catches per-segment exceptions and
        serves the unmarked segment so playback never breaks)."""
        import shutil as _shutil

        from ..fingerprint.marker import MarkedSegment
        from ..fingerprint.payloads import payload_for_segment

        marked, payloads = [], {}
        copies_info = {"segments": {}}
        failed = []
        out_dir = self.data_dir / "marked_segments"
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, seg in enumerate(segments):
            try:
                m, p, c = mark_segments(
                    [seg], out_dir, copies=self.num_copies, key=self.key,
                    first_segment_number=i,
                )
                marked.extend(m)
                payloads.update(p)
                copies_info["segments"].update(c["segments"])
            except Exception as e:  # pragma: no cover - exercised via tests
                logger.error("segment %d failed to mark (%s); using unmarked copies", i, e)
                failed.append({"segment_number": i, "error": str(e)})
                ext = Path(seg).suffix
                entry = []
                for copy_index in range(self.num_copies):
                    out = out_dir / f"marked_seg{i}_copy{copy_index}{ext}"
                    _shutil.copy2(seg, out)
                    payload = payload_for_segment(i, copy_index)
                    marked.append(
                        MarkedSegment(str(out), i, copy_index, payload.tolist())
                    )
                    payloads[f"{i}_{copy_index}"] = payload.tolist()
                    entry.append(
                        {"file": out.name, "payload": payload.tolist(), "copy_index": copy_index}
                    )
                copies_info["segments"][str(i)] = entry
        copies_info.update(
            {
                "total_segments": len(segments),
                "copies_per_segment": self.num_copies,
                "total_marked_segments": len(marked),
            }
        )
        return marked, payloads, copies_info, failed

    # -- views ------------------------------------------------------------------
    def _num_segments(self, mapping: dict) -> int:
        return 1 + max(v["segment_number"] for v in mapping["successful_segments"].values())

    def _variant_name(self, mapping: dict, seg: int, copy: int) -> str | None:
        for name, info in mapping["successful_segments"].items():
            if info["segment_number"] == seg and info["copy_index"] == copy:
                return name
        return None

    def start_view(self, username: str, num_copies: int | None = None) -> dict:
        if not username:
            raise ValueError("Username is required")
        with self._history_lock:
            return self._start_view_locked(username, num_copies)

    def _start_view_locked(self, username: str, num_copies: int | None) -> dict:
        num_copies = num_copies or self.num_copies
        mapping = self._load_mapping()
        history = self._load_history()
        view_number = len(history)
        num_segments = self._num_segments(mapping)
        pattern = pattern_for_view(view_number, num_copies, num_segments)
        segment_patterns = {}
        for i, c in enumerate(pattern):
            name = self._variant_name(mapping, i, c)
            if name is not None:
                segment_patterns[name] = mapping["successful_segments"][name]
        view_id = str(uuid.uuid4())
        history[view_id] = {
            "username": username,
            "timestamp": datetime.now().isoformat(),
            "view_number": view_number,
            "num_copies": num_copies,
            "num_segments": num_segments,
            "segment_patterns": segment_patterns,
            "segment_mapping": {
                "successful_segments": segment_patterns,
                "num_copies": num_copies,
                "description": "Maps segment numbers to their watermarked versions",
            },
        }
        self.history_file.write_text(json.dumps(history, indent=2))
        return {
            "status": "success",
            "view_id": view_id,
            "view_number": view_number,
            "num_copies": num_copies,
            "num_segments": num_segments,
            "segment_patterns": segment_patterns,
        }

    def view_playlist(self, view_id: str, uri_prefix: str = "/hls/") -> str:
        """Dynamic per-view m3u8 (reference: api/main.py:715-783)."""
        history = self._load_history()
        if view_id not in history:
            raise KeyError(view_id)
        view = history[view_id]
        mapping = self._load_mapping()
        pattern = pattern_for_view(
            view["view_number"], view["num_copies"], view["num_segments"]
        )
        entries = []
        for i, c in enumerate(pattern):
            name = self._variant_name(mapping, i, c)
            if name is not None:
                entries.append(f"{uri_prefix}{name}")
        return _media_playlist(entries, self.segment_duration)

    def view_history(self) -> dict:
        return self._load_history()

    def download_view(self, view_id: str) -> Path:
        """Concat the view's variant sequence into one file
        (reference: api/main.py:812-932)."""
        from ..fingerprint.leak import concatenate_segments

        history = self._load_history()
        view = history[view_id]
        mapping = self._load_mapping()
        pattern = pattern_for_view(view["view_number"], view["num_copies"], view["num_segments"])
        files = []
        for i, c in enumerate(pattern):
            name = self._variant_name(mapping, i, c)
            if name is not None:
                files.append(self.hls_dir / name)
        ext = files[0].suffix if files and files[0].suffix in (".avi", ".rawv") else ".mp4"
        if ext == ".avi":
            from ..io.mp4 import audio_sidecar

            # sidecar audio present: deliver a standard .mp4 that carries it
            # (concatenate_segments muxes JPEG chunks + audio, zero decode)
            if files and all(audio_sidecar(f).exists() for f in files):
                ext = ".mp4"
        out = self.data_dir / f"view_{view_id}{ext}"
        concatenate_segments(files, out)
        return out

    # -- leak detection -----------------------------------------------------------
    def detect(self, leaked_path) -> dict:
        """Identify which user's view a leaked segment came from
        (reference: api/main.py:552-705)."""
        history = self._load_history()
        if not history:
            return {"error": "No view history found"}
        frames, _ = _read_all(leaked_path)
        from ..pipeline import cached_bit_extractor

        fx = cached_bit_extractor(self.codec, self.key, 8, 16)
        payloads = np.concatenate(
            [fx.extract(frames[s : s + 16]) for s in range(0, len(frames), 16)]
        )
        from collections import Counter

        counter = Counter(map(tuple, payloads.tolist()))
        pattern, count = counter.most_common(1)[0]
        frequency = count / len(payloads)
        segment_number, copy_index = decode_segment_copy(np.array(pattern))
        if segment_number is None:
            return {"error": "Could not decode watermark pattern"}
        matches = []
        for view_id, view in history.items():
            pat = pattern_for_view(view["view_number"], view["num_copies"], view["num_segments"])
            if segment_number < len(pat) and pat[segment_number] == copy_index:
                # Per-match fields mirror the reference response contract
                # (reference: api/main.py:652-659) — the detect page renders
                # timestamp/payload/segment_number/frequency per card
                # (templates.py _DETECT match cards), so every field it
                # dereferences must be present here.
                matches.append(
                    {
                        "view_id": view_id,
                        "username": view["username"],
                        "view_number": view["view_number"],
                        "timestamp": view.get("timestamp", ""),
                        "payload": list(map(int, pattern)),
                        "segment_number": int(segment_number),
                        "copy_index": int(copy_index),
                        "frequency": float(frequency),
                    }
                )
        return {
            "status": "success" if matches else "no_match",
            "segment_number": segment_number,
            "copy_index": copy_index,
            "frequency": frequency,
            "pattern": list(map(int, pattern)),
            "matches": matches,
        }
