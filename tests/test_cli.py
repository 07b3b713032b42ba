"""CLI surface tests (in-process argv invocation)."""

import json

import numpy as np
import pytest

from vfp_tpu.cli.__main__ import main
from vfp_tpu.io import RawVideoWriter

from test_dwt_dct_svd import natural_frames


@pytest.fixture(scope="module")
def source_video(tmp_path_factory):
    rng = np.random.RandomState(11)
    d = tmp_path_factory.mktemp("clisrc")
    p = d / "source.rawv"
    with RawVideoWriter(p, 96, 64, fps=6) as w:
        w.write_batch(natural_frames(rng, b=12, h=64, w=96))
    return p


class TestMarkDetect:
    def test_mark_then_detect(self, source_video, tmp_path, capsys):
        out = tmp_path / "marked.avi"
        main(["mark", str(source_video), str(out), "--payload", "01100101", "--batch-size", "8"])
        assert out.exists()
        captured = capsys.readouterr().out
        assert "marked 12 frames" in captured

        main(["detect", str(out), "--payload-len", "8", "--batch-size", "8"])
        captured = capsys.readouterr().out
        assert "majority payload: 01100101" in captured
        assert "frequency 1.00" in captured

        # --payload sets the length AND verifies the match (exit 0)
        main(["detect", str(out), "--payload", "01100101", "--batch-size", "8"])
        captured = capsys.readouterr().out
        assert "matches expected payload: True" in captured

        import pytest

        with pytest.raises(SystemExit):  # wrong expectation -> exit 1
            main(["detect", str(out), "--payload", "11111111", "--batch-size", "8"])


class TestHlsWorkflow:
    def test_full_hls_leak_trace(self, source_video, tmp_path, capsys):
        base = tmp_path / "hls_out"
        main([
            "hls-mark", str(source_video), str(base),
            "--copies", "2", "--segment-duration", "1", "--batch-size", "8",
        ])
        out = capsys.readouterr().out
        assert "All segments were watermarked successfully!" in out
        assert (base / "segment_payloads.json").exists()
        assert (base / "segment_copies.json").exists()
        assert (base / "segment_mapping.json").exists()
        assert (base / "hls" / "playlist.m3u8").exists()
        assert (base / "hls" / "master.m3u8").exists()

        main(["leak", str(base / "segment_copies.json"), "--pattern", "101", "--detect",
              "--segment-duration", "1"])
        out = capsys.readouterr().out
        assert "Copy fingerprint: 10" in out  # 12 frames @6fps/1s -> 2 segments

    def test_hls_mark_workers_matches_serial(self, source_video, tmp_path, capsys):
        """`hls-mark --workers N` (process farm) must be a pure scaling knob:
        identical manifests and marked bytes to the serial run (VERDICT r3
        item 5 — multi-host segment marking as a CLI flag)."""
        serial, farmed = tmp_path / "serial", tmp_path / "farmed"
        for extra, base in ((), serial), (("--workers", "2"), farmed):
            main([
                "hls-mark", str(source_video), str(base),
                "--copies", "2", "--segment-duration", "1", "--batch-size", "8",
                *extra,
            ])
            out = capsys.readouterr().out
            assert "All segments were watermarked successfully!" in out
        for name in ("segment_payloads.json", "segment_copies.json",
                     "segment_mapping.json"):
            assert json.loads((serial / name).read_text()) == \
                json.loads((farmed / name).read_text()), name
        a = sorted((serial / "marked_segments").iterdir())
        b = sorted((farmed / "marked_segments").iterdir())
        assert [f.name for f in a] == [f.name for f in b] and a
        for fa, fb in zip(a, b):
            assert fa.read_bytes() == fb.read_bytes(), fa.name


class TestDurability:
    def test_durability_passes(self, source_video, tmp_path, capsys):
        with pytest.raises(SystemExit) as e:
            main([
                "durability", str(source_video), str(tmp_path / "dur"),
                "--segment-duration", "1", "--quality", "95",
            ])
        assert e.value.code == 0
        out = capsys.readouterr().out
        assert '"is_successful": true' in out


class TestDurabilityCorr:
    def test_dtcwt_corr_durability(self, tmp_path, capsys):
        """DT-CWT spread-spectrum durability: keyed-plane identification must
        survive the splice + MJPEG re-encode cycle (VERDICT r1 item 7)."""
        rng = np.random.RandomState(5)
        src = tmp_path / "src.rawv"
        from test_dwt_dct_svd import natural_frames as nf
        with RawVideoWriter(src, 192, 128, fps=6) as w:
            w.write_batch(nf(rng, b=18, h=128, w=192))
        with pytest.raises(SystemExit) as e:
            main([
                "durability", str(src), str(tmp_path / "dur"),
                "--segment-duration", "1", "--quality", "95",
                "--codec", "dtcwtKey",
            ])
        assert e.value.code == 0
        out = capsys.readouterr().out
        report = json.loads(out)
        assert report["is_successful"] and report["segment_pairs"] >= 3
        assert report["reencoded_avg_frequency"] >= 0.5


class TestDistributedCli:
    def test_hls_mark_distributed_matches_serial(self, source_video, tmp_path,
                                                 capsys):
        """End-to-end `hls-mark --distributed`: two REAL processes, a
        localhost jax.distributed coordinator, one shared output dir —
        manifests and marked bytes byte-identical to the serial run
        (VERDICT r4 item 6; reference semantics: one marking sweep split
        across hosts, tests/mark_video_to_hls.py)."""
        import os
        import socket
        import subprocess
        import sys as _sys
        from pathlib import Path

        serial = tmp_path / "serial"
        main([
            "hls-mark", str(source_video), str(serial),
            "--copies", "2", "--segment-duration", "1", "--batch-size", "8",
        ])
        capsys.readouterr()

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        dist = tmp_path / "dist"
        repo = str(Path(__file__).resolve().parent.parent)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # no virtual mesh in the rank processes
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs = []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [_sys.executable, "-m", "vfp_tpu.cli", "--platform", "cpu",
                 "hls-mark", str(source_video), str(dist),
                 "--copies", "2", "--segment-duration", "1",
                 "--batch-size", "8",
                 "--distributed", "--coordinator", f"127.0.0.1:{port}",
                 "--num-processes", "2", "--process-id", str(pid)],
                env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE))
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (o, e) in zip(procs, outs):
            assert p.returncode == 0, (o.decode()[-1000:], e.decode()[-2000:])
        assert b"All segments were watermarked successfully!" in outs[0][0]
        assert b"rank 1: shard done" in outs[1][0]

        for name in ("segment_payloads.json", "segment_copies.json",
                     "segment_mapping.json"):
            assert json.loads((serial / name).read_text()) == \
                json.loads((dist / name).read_text()), name
        a = sorted((serial / "marked_segments").iterdir())
        # the distributed dir additionally holds per-rank manifest shards
        b = sorted(f for f in (dist / "marked_segments").iterdir()
                   if not f.name.startswith("manifest_rank"))
        assert [f.name for f in a] == [f.name for f in b] and a
        for fa, fb in zip(a, b):
            assert fa.read_bytes() == fb.read_bytes(), fa.name
