#!/usr/bin/env python3
"""Detect the local JAX hardware and suggest backend/target settings.

Equivalent of the reference's utility_scripts/plssvm_target_platforms.py
(which inspects CPUs/GPUs to suggest a PLSSVM_TARGET_PLATFORMS string); here
the platforms are whatever JAX backends are live.

Usage: python tools/plssvm_target_platforms.py [--quiet]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quiet", action="store_true",
                        help="only output the final target string")
    args = parser.parse_args()

    import jax

    devices = jax.devices()
    platforms = sorted({dev.platform for dev in devices})

    if not args.quiet:
        print(f"JAX {jax.__version__}")
        for dev in devices:
            print(f"  {dev.id}: {dev.device_kind} ({dev.platform})")
        try:
            cpus = jax.devices("cpu")
            print(f"  + {len(cpus)} CPU host device(s)")
        except RuntimeError:
            pass
        print()

    if any(p in ("tpu", "axon") for p in platforms):
        target = "tpu"
        backend = "pallas"
    elif "gpu" in platforms or "cuda" in platforms or "rocm" in platforms:
        target = "gpu"
        backend = "xla"
    else:
        target = "cpu"
        backend = "xla"
    if not args.quiet:
        print("suggested settings:")
    print(f"--target_platform={target} --backend={backend}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
