"""Container metadata probe (reference: src/offmark/common/__video.py:12-23).

Uses ffprobe when the binary exists, else OpenCV.  Returns at least
``{'width', 'height'}`` plus fps/frame count when known.
"""

from __future__ import annotations

import json
import shutil
import subprocess


def probe(video_file: str) -> dict:
    if shutil.which("ffprobe"):
        out = subprocess.run(
            [
                "ffprobe", "-v", "quiet", "-print_format", "json",
                "-show_streams", str(video_file),
            ],
            capture_output=True, check=True,
        ).stdout
        info = json.loads(out)
        vs = next(s for s in info["streams"] if s.get("codec_type") == "video")
        d = {"width": int(vs["width"]), "height": int(vs["height"])}
        if "r_frame_rate" in vs and "/" in vs["r_frame_rate"]:
            num, den = vs["r_frame_rate"].split("/")
            if float(den):
                d["fps"] = float(num) / float(den)
        if "nb_frames" in vs:
            d["frames"] = int(vs["nb_frames"])
        return d

    import cv2

    cap = cv2.VideoCapture(str(video_file))
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_file}")
    d = {
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        "fps": float(cap.get(cv2.CAP_PROP_FPS)) or 30.0,
        "frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
    }
    cap.release()
    return d
