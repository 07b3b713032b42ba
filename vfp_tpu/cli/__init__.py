"""Command-line interface: python -m vfp_tpu.cli <command>."""
