"""vfp_tpu — TPU-native forensic video watermarking & HLS fingerprinting.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``vikasdimaniya/video-fingerprinting`` ("offmark-py") framework: invisible
per-frame frequency-domain watermark codecs, keyed payload spread/recovery,
batched video pipelines, HLS per-segment fingerprinting, leak simulation and
leak tracing, and a serving layer.

Design: frames are a batch axis (``[B, H, W, C]`` tensors), every codec is a
pure jittable function, parallelism is expressed with ``jax.sharding`` over a
device mesh, and the hot embed/extract path has a fused Pallas TPU kernel.
"""

__version__ = "0.1.0"
