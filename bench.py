"""Benchmark: 1080p embed throughput on one TPU chip vs the reference CPU path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline protocol (BASELINE.md): the reference publishes no numbers, so the
baseline is the *measured* per-frame CPU implementation of the reference
algorithm (per-block cv2.dct + np.linalg.svd loop — tests/oracle.py is that
implementation).  Measured once and cached in BENCH_BASELINE.json because it
runs at seconds per 1080p frame.
"""

import json
import os
import signal
import sys
import time
from pathlib import Path

import numpy as np

# Watchdog: if the axon relay is down, backend init hangs indefinitely —
# fail loudly instead so the driver records an error, not a stall.  Budget
# covers a cold compile (~40 s) plus the relay's worst observed first-fetch
# stall (20+ min under load); override with VFP_BENCH_TIMEOUT seconds.
_TIMEOUT = int(os.environ.get("VFP_BENCH_TIMEOUT", "2100"))
if hasattr(signal, "SIGALRM") and _TIMEOUT > 0:
    def _on_timeout(signum, frame):  # pragma: no cover - only fires on a hang
        print(
            f"bench.py: no result within {_TIMEOUT}s "
            "(TPU relay down or stalled); aborting",
            file=sys.stderr,
        )
        os._exit(2)

    signal.signal(signal.SIGALRM, _on_timeout)
    signal.alarm(_TIMEOUT)

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

# persistent compile cache: repeat runs (and the driver's end-of-round run
# after a warm suite) skip the multi-minute 1-core XLA compiles
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1080, 1920
BASELINE_FILE = REPO / "BENCH_BASELINE.json"


def natural_frames(rng, b, h, w):
    small = rng.rand(b, h // 8, w // 8, 3)
    f = np.repeat(np.repeat(small, 8, axis=1), 8, axis=2) * 220 + rng.rand(b, h, w, 3) * 20
    return np.clip(f, 0, 255).astype(np.uint8)


def measure_cpu_baseline() -> float:
    """Reference-equivalent CPU embed fps at 1080p (per-block LAPACK loop)."""
    import oracle
    from vfp_tpu.wm import Shuffler
    from vfp_tpu.fingerprint import payload_for_segment

    rng = np.random.RandomState(0)
    frame = natural_frames(rng, 1, H, W)[0]
    wm = Shuffler(key=0).generate_wm(payload_for_segment(1, 2), (1, H * W // 64))
    wm = np.asarray(wm).flatten().astype(np.float64)
    t0 = time.perf_counter()
    oracle.mark_frame_u8(frame, wm)
    dt = time.perf_counter() - t0
    return 1.0 / dt


def measure_tpu(batch: int = 128, iters: int = 96, windows: int = 3) -> float:
    # batch 128: r5 chip sweep (tools/bench_8k_sweep.py --1080p) measured
    # B=32 16267 / B=64 20442 / B=96 22016 / B=128 23184 fps in one window
    # — post-alias the kernel's per-iteration overhead amortizes over more
    # frames.
    """Steady-state embed fps via an on-device loop + scalar checksum fetch.

    (block_until_ready is unreliable over the axon tunnel and full-frame
    host transfers are tunnel-bound; chaining iterations on device and
    fetching one scalar measures pure chip throughput.  The relay adds
    ~25 ms per *call*, so iters must be large enough to amortize it:
    measured 2480 fps at iters=4 vs 6600 at iters=48 for the SAME kernel —
    at iters=96 the call overhead is ~2% of the loop.  Relay weather still
    varies identical windows by ~8%, and that noise only ever SUBTRACTS
    from a throughput measurement, so the steady-state figure is the best
    of ``windows`` timed windows — each is only ~0.25 s of chip time.)
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from vfp_tpu.wm import DwtDctSvd, Shuffler
    from vfp_tpu.fingerprint import payload_for_segment

    codec = DwtDctSvd()
    rng = np.random.RandomState(0)
    frames = jnp.asarray(natural_frames(rng, batch, H, W))
    wm = Shuffler(key=0).generate_wm(payload_for_segment(1, 2), codec.wm_capacity((H, W, 3)))
    wm = jnp.asarray(np.asarray(wm).reshape(-1), jnp.float32)

    @partial(jax.jit, static_argnums=2)
    def loop(frames, wm, n):
        def body(i, x):
            return codec.mark_frames(x, wm)

        return jnp.sum(jax.lax.fori_loop(0, n, body, frames).astype(jnp.int32))

    int(loop(frames, wm, iters))  # compile + warm
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        int(loop(frames, wm, iters))
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def main():
    if BASELINE_FILE.exists():
        cpu_fps = json.loads(BASELINE_FILE.read_text())["embed_1080p_fps_cpu"]
    else:
        cpu_fps = measure_cpu_baseline()
        BASELINE_FILE.write_text(
            json.dumps(
                {
                    "embed_1080p_fps_cpu": cpu_fps,
                    "note": "reference-equivalent per-frame CPU loop (tests/oracle.py), measured on this container",
                },
                indent=2,
            )
        )

    tpu_fps = measure_tpu()
    signal.alarm(0) if hasattr(signal, "SIGALRM") else None
    print(
        json.dumps(
            {
                "metric": "embed_1080p_fps_per_chip",
                "value": round(tpu_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(tpu_fps / cpu_fps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
