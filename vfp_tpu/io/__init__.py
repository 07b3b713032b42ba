"""Video I/O: pluggable frame readers/writers + container helpers.

The reference's I/O layer is two ffmpeg subprocesses piping rawvideo rgb24
(reference: src/offmark/video/frame_reader.py:44-64, frame_writer.py:30-44).
This environment may not have an ffmpeg binary, so I/O is a backend registry:

* ``FFmpegPipeReader/Writer`` — subprocess rawvideo pipes (preferred when the
  ffmpeg binary exists; batched reads, not frame-at-a-time).
* ``Cv2Reader/Cv2Writer`` — OpenCV videoio (bundled ffmpeg libs: H.264/HEVC
  decode, mp4v/MJPG encode).
* ``MjpegAviWriter`` — self-contained AVI muxer with per-frame JPEG encode and
  controllable quality (the default lossy writer without ffmpeg).
* ``RawVideoReader/Writer`` — exact uint8 RGB transport (own trivial format).
* ``ArrayReader/ArrayWriter`` — in-memory, the ffmpeg-less test seam (the
  reference's FrameReader stub base, frame_reader.py:14-23, is the analogue).

All readers yield frames in *file byte order* (RGB) and writers accept the
same, matching the reference's convention of running BGR-coded math over
RGB-ordered bytes end-to-end (see SURVEY.md §7 "RGB/BGR quirk").
"""

from .readers import FrameReader, ArrayReader, Cv2Reader, RawVideoReader, open_reader  # noqa: F401
from .writers import FrameWriter, ArrayWriter, Cv2Writer, MjpegAviWriter, RawVideoWriter, open_writer  # noqa: F401
from .y4m import Y4MReader, Y4MWriter  # noqa: F401
from .probe import probe  # noqa: F401
from .ffmpeg import (  # noqa: F401
    have_ffmpeg,
    FFmpegPipeReader,
    FFmpegPipeWriter,
)
