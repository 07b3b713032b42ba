"""Box-level MP4 remuxer tests (io/mp4.py).

The ground truth for every stream-copy claim is cv2's real demuxer/decoder:
if a remuxed file decodes to bit-identical frames, no lossy generation
happened (reference behavior: ``-c copy`` concat tests/generate_leak.py:126-141,
fMP4 fragmenting api/main.py:113-124).
"""

import time

import numpy as np
import cv2
import pytest

from vfp_tpu.io.mp4 import (
    Track,
    add_audio_track,
    concat_mp4,
    fragment_mp4,
    read_mp4,
    slice_track_by_time,
    write_mp4,
)

REF_CLIP = "/root/reference/tests/media/in.mp4"


def decode_frames(path):
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames) if frames else None


def sample_bytes(track):
    out = []
    for s in track.samples:
        with open(s.src, "rb") as f:
            f.seek(s.offset)
            out.append(f.read(s.size))
    return b"".join(out)


@pytest.fixture()
def mp4v_segments(tmp_path):
    """Three cv2-written mp4v segments + their decoded frames."""
    rng = np.random.RandomState(0)
    segs, frames = [], []
    for i in range(3):
        p = tmp_path / f"s{i}.mp4"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 6, (64, 48))
        for f in rng.randint(0, 255, (6, 48, 64, 3), dtype=np.uint8):
            w.write(f)
        w.release()
        segs.append(p)
        frames.append(decode_frames(p))
    return segs, frames


class TestParse:
    def test_reference_clip_layout(self):
        m = read_mp4(REF_CLIP)
        v, a = m.video(), m.audio()
        assert v is not None and a is not None
        assert v.codec_fourcc() == b"avc1" and a.codec_fourcc() == b"mp4a"
        assert len(v.samples) == 209  # known fixture frame count
        assert len(a.samples) == 303
        assert v.timescale == 90000 and a.timescale == 44100
        assert int(v.width) == 320 and int(v.height) == 240
        # H.264 has non-sync P/B frames; AAC is all-sync
        assert not all(s.sync for s in v.samples)
        assert all(s.sync for s in a.samples)

    def test_cv2_mp4v_layout(self, mp4v_segments):
        segs, frames = mp4v_segments
        m = read_mp4(segs[0])
        v = m.video()
        assert v.codec_fourcc() == b"mp4v"
        assert len(v.samples) == 6
        assert m.audio() is None

    def test_missing_moov_raises(self, tmp_path):
        p = tmp_path / "x.mp4"
        p.write_bytes(b"\x00\x00\x00\x08free")
        with pytest.raises(IOError):
            read_mp4(p)


class TestRewrite:
    def test_rewrite_decodes_identically(self, tmp_path):
        m = read_mp4(REF_CLIP)
        out = tmp_path / "rw.mp4"
        write_mp4(out, m.tracks)
        a, b = decode_frames(REF_CLIP), decode_frames(out)
        assert np.array_equal(a, b)

    def test_rewrite_preserves_audio_bytes_and_timing(self, tmp_path):
        m = read_mp4(REF_CLIP)
        out = tmp_path / "rw.mp4"
        write_mp4(out, m.tracks)
        m2 = read_mp4(out)
        assert sample_bytes(m2.audio()) == sample_bytes(m.audio())
        assert [s.duration for s in m2.audio().samples] == \
            [s.duration for s in m.audio().samples]
        assert m2.audio().stsd == m.audio().stsd  # esds codec config verbatim
        # video sync flags and composition offsets survive too
        assert [s.sync for s in m2.video().samples] == \
            [s.sync for s in m.video().samples]
        assert [s.cts for s in m2.video().samples] == \
            [s.cts for s in m.video().samples]


class TestConcat:
    def test_concat_is_stream_copy(self, mp4v_segments, tmp_path):
        segs, frames = mp4v_segments
        out = tmp_path / "cat.mp4"
        concat_mp4(segs, out)
        got = decode_frames(out)
        # bit-identical to decoding each input: zero lossy generations
        assert np.array_equal(got, np.concatenate(frames))

    def test_concat_carries_audio(self, tmp_path):
        out = tmp_path / "cat.mp4"
        concat_mp4([REF_CLIP, REF_CLIP], out)
        m = read_mp4(out)
        ref = read_mp4(REF_CLIP)
        assert len(m.audio().samples) == 2 * len(ref.audio().samples)
        assert sample_bytes(m.audio()) == sample_bytes(ref.audio()) * 2
        got = decode_frames(out)
        a = decode_frames(REF_CLIP)
        assert got.shape[0] == 2 * a.shape[0]
        assert np.array_equal(got[: len(a)], a)

    def test_codec_mismatch_raises(self, mp4v_segments, tmp_path):
        segs, _ = mp4v_segments
        with pytest.raises(IOError):
            concat_mp4([segs[0], REF_CLIP], tmp_path / "bad.mp4")


class TestFragment:
    def test_standalone_m4s_decodes(self, mp4v_segments, tmp_path):
        segs, frames = mp4v_segments
        m4s = tmp_path / "s0.m4s"
        fragment_mp4(segs[0], m4s)
        assert np.array_equal(decode_frames(m4s), frames[0])

    def test_fragmented_parse_roundtrip(self, mp4v_segments, tmp_path):
        segs, _ = mp4v_segments
        m4s = tmp_path / "s0.m4s"
        fragment_mp4(segs[0], m4s)
        src, frag = read_mp4(segs[0]), read_mp4(m4s)
        assert len(frag.video().samples) == len(src.video().samples)
        assert [s.size for s in frag.video().samples] == \
            [s.size for s in src.video().samples]
        assert [s.duration for s in frag.video().samples] == \
            [s.duration for s in src.video().samples]
        assert sample_bytes(frag.video()) == sample_bytes(src.video())

    def test_multitrack_fragment(self, tmp_path):
        m4s = tmp_path / "ref.m4s"
        fragment_mp4(REF_CLIP, m4s)
        assert np.array_equal(decode_frames(m4s), decode_frames(REF_CLIP))
        frag = read_mp4(m4s)
        assert sample_bytes(frag.audio()) == sample_bytes(read_mp4(REF_CLIP).audio())

    def test_m4s_concat(self, mp4v_segments, tmp_path):
        """download_view splices .m4s variants without ffmpeg."""
        segs, frames = mp4v_segments
        m4ss = []
        for i, s in enumerate(segs):
            q = tmp_path / f"s{i}.m4s"
            fragment_mp4(s, q)
            m4ss.append(q)
        out = tmp_path / "view.mp4"
        concat_mp4(m4ss, out)
        assert np.array_equal(decode_frames(out), np.concatenate(frames))


class TestAudioCarry:
    def test_slice_track_by_time(self):
        a = read_mp4(REF_CLIP).audio()
        total = a.duration / a.timescale
        first = slice_track_by_time(a, 0.0, 2.0)
        second = slice_track_by_time(a, 2.0, 4.0)
        rest = slice_track_by_time(a, 4.0, total + 1)
        assert len(first.samples) + len(second.samples) + len(rest.samples) == \
            len(a.samples)
        assert sample_bytes(first) + sample_bytes(second) + sample_bytes(rest) == \
            sample_bytes(a)
        assert abs(first.duration / a.timescale - 2.0) < 0.1

    def test_add_audio_track(self, mp4v_segments, tmp_path):
        segs, frames = mp4v_segments
        audio = slice_track_by_time(read_mp4(REF_CLIP).audio(), 0.0, 1.0)
        want_bytes = sample_bytes(audio)
        add_audio_track(segs[0], audio)  # in place
        m = read_mp4(segs[0])
        assert m.audio() is not None
        assert sample_bytes(m.audio()) == want_bytes
        # video still decodes bit-identically after the remux
        assert np.array_equal(decode_frames(segs[0]), frames[0])


class TestAudioEndToEnd:
    """VERDICT r3 item 4: a marked -> leaked clip with an audio track keeps
    it end-to-end with no ffmpeg — segmenter writes per-segment audio
    sidecars, the marker propagates them to every variant, and the leak
    splice muxes JPEG chunks + audio into a standard .mp4 (zero decode)."""

    @pytest.fixture()
    def av_source(self, tmp_path):
        """12-frame mp4v video + the reference clip's first 2s of AAC."""
        rng = np.random.RandomState(3)
        p = tmp_path / "src.mp4"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 6, (64, 48))
        frames = np.repeat(np.repeat(
            rng.randint(0, 255, (12, 6, 8, 3), dtype=np.uint8), 8, 1), 8, 2)
        for f in frames:
            w.write(f)
        w.release()
        audio = slice_track_by_time(read_mp4(REF_CLIP).audio(), 0.0, 2.0)
        add_audio_track(p, audio)
        return p

    def test_segment_mark_leak_keeps_audio(self, av_source, tmp_path):
        from vfp_tpu.fingerprint import segment_video
        from vfp_tpu.fingerprint.marker import mark_segments
        from vfp_tpu.fingerprint.leak import generate_leak
        from vfp_tpu.io.ffmpeg import have_ffmpeg
        from vfp_tpu.io.mp4 import audio_sidecar

        if have_ffmpeg():
            pytest.skip("container has ffmpeg; this covers the fallback")
        base = tmp_path / "out"
        segs = segment_video(av_source, base / "segments", 1.0)
        assert len(segs) == 2
        # sidecars exist and their bytes re-slice the source audio exactly
        src_audio = read_mp4(av_source).audio()
        sidecar_bytes = b""
        for s in segs:
            sc = audio_sidecar(s)
            assert sc.exists(), s
            sidecar_bytes += sample_bytes(read_mp4(sc).audio())
        assert sidecar_bytes == sample_bytes(src_audio)

        marked, payloads, copies = mark_segments(
            segs, base / "marked_segments", copies=2, batch_size=8)
        for m in marked:
            assert audio_sidecar(m.file).exists(), m.file
        import json

        (base / "segment_copies.json").write_text(json.dumps(copies))
        leaked, info = generate_leak(base / "segment_copies.json", pattern="10")
        assert str(leaked).endswith(".mp4")
        out = read_mp4(leaked)
        # audio retained, bitwise, in segment order
        assert out.audio() is not None
        assert sample_bytes(out.audio()) == sidecar_bytes
        # video is a stream copy of the selected marked variants: decoding
        # the leak equals decoding those variants (no lossy generation)
        want = np.concatenate([
            decode_frames(base / "marked_segments" / "marked_seg0_copy1.avi"),
            decode_frames(base / "marked_segments" / "marked_seg1_copy0.avi"),
        ])
        assert np.array_equal(decode_frames(leaked), want)


class TestLeakIntegration:
    def test_concatenate_segments_stream_copies_mp4(self, mp4v_segments, tmp_path):
        """fingerprint.leak.concatenate_segments on .mp4 without ffmpeg must
        be a stream copy, not a lossy frame splice (VERDICT r3 item 3a)."""
        from vfp_tpu.fingerprint.leak import concatenate_segments
        from vfp_tpu.io.ffmpeg import have_ffmpeg

        if have_ffmpeg():
            pytest.skip("container has ffmpeg; this covers the fallback")
        segs, frames = mp4v_segments
        out = tmp_path / "leaked.mp4"
        concatenate_segments(segs, out)
        got = decode_frames(out)
        # exact decode equality == no re-encode happened
        assert np.array_equal(got, np.concatenate(frames))

    def test_write_hls_playlists_emits_m4s(self, mp4v_segments, tmp_path):
        """write_hls_playlists fragments .mp4 variants into standalone .m4s
        without ffmpeg (VERDICT r3 item 3b; reference api/main.py:113-124)."""
        from vfp_tpu.fingerprint.hls import write_hls_playlists
        from vfp_tpu.fingerprint.marker import MarkedSegment
        from vfp_tpu.io.ffmpeg import have_ffmpeg

        if have_ffmpeg():
            pytest.skip("container has ffmpeg; this covers the fallback")
        segs, frames = mp4v_segments
        marked = [MarkedSegment(str(s), i, 0, [0, 1]) for i, s in enumerate(segs)]
        master, playlist, seg_map, variants = write_hls_playlists(
            marked, tmp_path / "hls", copies=1, segment_duration=1.0)
        names = [variants[i][0] for i in range(3)]
        assert all(n.endswith(".m4s") for n in names)
        text = playlist.read_text()
        assert names[0] in text
        for i, n in enumerate(names):
            assert np.array_equal(
                decode_frames(tmp_path / "hls" / n), frames[i])


class TestAdviceR4:
    """Fixes from the round-4 advisor findings (ADVICE.md)."""

    def test_largesize_mdat_roundtrip(self, mp4v_segments, tmp_path, monkeypatch):
        """>4GiB outputs must emit a 64-bit largesize mdat header (and co64)
        instead of overflowing the u32 size field.  The threshold is shrunk
        so the path runs on a small file."""
        import vfp_tpu.io.mp4 as m

        monkeypatch.setattr(m, "_MDAT_U32_MAX", 64)
        segs, frames = mp4v_segments
        out = tmp_path / "big.mp4"
        concat_mp4(segs, out)
        raw = out.read_bytes()
        # first mdat header uses size==1 + 64-bit largesize
        pos = raw.find(b"mdat") - 4
        assert raw[pos:pos + 4] == b"\x00\x00\x00\x01"
        import struct as _s

        assert _s.unpack_from(">Q", raw, pos + 8)[0] > 16
        # sample tables still resolve the right bytes
        got = read_mp4(out)
        want = b"".join(sample_bytes(read_mp4(s).video()) for s in segs)
        assert sample_bytes(got.video()) == want
        # and a real demuxer still decodes it bit-identically
        assert np.array_equal(decode_frames(out), np.concatenate(frames))

    def test_multi_trun_offset_carry(self):
        """A traf with several truns lacking the data-offset flag continues
        after the previous run's bytes (ISO 14496-12 8.8.8), not from the
        base offset again."""
        import struct as _s

        from vfp_tpu.io.mp4 import Track, _box, _full, _parse_fragments

        sizes1, sizes2 = [5, 7], [11, 3]

        def build(moof_len):
            tfhd = _full(b"tfhd", 0, 0x020000, _s.pack(">I", 1))
            trun1 = _full(b"trun", 1, 0x000001 | 0x000200,
                          _s.pack(">Ii", len(sizes1), moof_len + 8)
                          + b"".join(_s.pack(">I", s) for s in sizes1))
            trun2 = _full(b"trun", 1, 0x000200,  # no data-offset flag
                          _s.pack(">I", len(sizes2))
                          + b"".join(_s.pack(">I", s) for s in sizes2))
            mfhd = _full(b"mfhd", 0, 0, _s.pack(">I", 1))
            return _box(b"moof", mfhd + _box(b"traf", tfhd + trun1 + trun2))

        moof = build(len(build(0)))
        payload = bytes(range(sum(sizes1) + sum(sizes2)))
        buf = moof + _box(b"mdat", payload)
        tr = Track(handler=b"vide", timescale=600, stsd=b"", track_id=1)
        _parse_fragments(buf, "synthetic", {1: tr})
        offs = [s.offset for s in tr.samples]
        base = len(moof) + 8
        assert offs == [base, base + 5, base + 12, base + 23]

    def test_leak_concat_accepts_m4s(self, mp4v_segments, tmp_path):
        """concatenate_segments must keep .m4s inputs on the stream-copy
        branch (they are what the no-ffmpeg HLS writer emits)."""
        from vfp_tpu.fingerprint.leak import concatenate_segments
        from vfp_tpu.io.ffmpeg import have_ffmpeg

        if have_ffmpeg():
            pytest.skip("container has ffmpeg; this covers the fallback")
        segs, frames = mp4v_segments
        m4ss = []
        for i, s in enumerate(segs):
            q = tmp_path / f"v{i}.m4s"
            fragment_mp4(s, q)
            m4ss.append(q)
        out = tmp_path / "leak.mp4"
        concatenate_segments(m4ss, out)
        # exact decode equality == the lossy frame-splice fallback NOT taken
        assert np.array_equal(decode_frames(out), np.concatenate(frames))


class TestFuzz:
    """Foreign-file robustness: read_mp4 over corrupt/hostile inputs must
    either parse or raise IOError promptly — never leak struct.error /
    KeyError / IndexError, never expand an attacker-chosen entry count into
    a multi-GB list or an unbounded loop.  (The reference shells out to
    ffmpeg, which carries its own demuxer hardening; our box parser is the
    equivalent trust boundary for leak/serve inputs.)"""

    @pytest.fixture()
    def small_mp4(self, mp4v_segments, tmp_path):
        """A small progressive MP4 in our own writer's layout."""
        segs, _ = mp4v_segments
        out = tmp_path / "own.mp4"
        write_mp4(out, read_mp4(segs[0]).tracks)
        return out

    @pytest.fixture()
    def small_m4s(self, mp4v_segments, tmp_path):
        segs, _ = mp4v_segments
        out = tmp_path / "own.m4s"
        fragment_mp4(segs[0], out)
        return out

    @staticmethod
    def _try_parse(path):
        t0 = time.monotonic()
        try:
            m = read_mp4(path)
            assert m.tracks is not None
        except IOError:
            pass
        # promptness: no quadratic/unbounded expansion path was taken
        assert time.monotonic() - t0 < 5.0

    def test_truncations(self, small_mp4, tmp_path):
        raw = small_mp4.read_bytes()
        p = tmp_path / "t.mp4"
        for cut in list(range(0, len(raw), 211)) + [len(raw) - 1]:
            p.write_bytes(raw[:cut])
            self._try_parse(p)

    def test_byte_flips(self, small_mp4, small_m4s, tmp_path):
        rng = np.random.RandomState(0)
        for src in (small_mp4, small_m4s):
            raw = bytearray(src.read_bytes())
            p = tmp_path / f"f{src.suffix.lstrip('.')}.mp4"
            for _ in range(200):
                mut = bytearray(raw)
                for _ in range(rng.randint(1, 9)):
                    mut[rng.randint(len(mut))] = rng.randint(256)
                p.write_bytes(bytes(mut))
                self._try_parse(p)

    def test_random_garbage(self, tmp_path):
        rng = np.random.RandomState(1)
        p = tmp_path / "g.mp4"
        for i in range(50):
            buf = rng.randint(0, 256, rng.randint(0, 4096), dtype=np.uint8)
            body = buf.tobytes()
            if i % 2:  # half get a plausible ftyp so parsing goes deeper
                body = b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2" + body
            p.write_bytes(body)
            self._try_parse(p)

    @staticmethod
    def _patch_u32(raw, marker, field_off, value):
        import struct as _s

        pos = raw.find(marker)
        assert pos > 0
        out = bytearray(raw)
        _s.pack_into(">I", out, pos + field_off, value)
        return bytes(out)

    def test_huge_stsz_count(self, small_mp4, tmp_path):
        # stsz: type .. ver/flags(4) sample_size(4) count(4)
        p = tmp_path / "h.mp4"
        p.write_bytes(self._patch_u32(
            small_mp4.read_bytes(), b"stsz", 12, 0xFFFFFFFF))
        t0 = time.monotonic()
        with pytest.raises(IOError):
            read_mp4(p)
        assert time.monotonic() - t0 < 2.0

    def test_huge_stts_run(self, small_mp4, tmp_path):
        # stts: ver/flags(4) entry_count(4) [count(4) delta(4)]...
        # entry_count stays valid; the first run's count goes hostile —
        # expansion must stay capped at the stsz sample count
        p = tmp_path / "h2.mp4"
        p.write_bytes(self._patch_u32(
            small_mp4.read_bytes(), b"stts", 12, 0x7FFFFFFF))
        self._try_parse(p)

    def test_huge_trun_count(self, small_m4s, tmp_path):
        # trun: ver/flags(4) sample_count(4)
        p = tmp_path / "h3.mp4"
        p.write_bytes(self._patch_u32(
            small_m4s.read_bytes(), b"trun", 4, 0xFFFFFFFF))
        t0 = time.monotonic()
        with pytest.raises(IOError):
            read_mp4(p)
        assert time.monotonic() - t0 < 2.0
