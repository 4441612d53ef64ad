"""Run the full verification battery in one command (what the round driver
checks): test suite, bench, entry compile, multichip dryrun.

    python tools/check_all.py [--skip-tests] [--skip-bench]

Serializes everything (the TPU tunnel on this class of host is
single-client — see STATUS.md).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, label=""):
    print(f"\n=== {label or ' '.join(cmd)} ===", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    rc = subprocess.call(cmd, cwd=REPO, env=e)
    if rc != 0:
        print(f"FAILED: {label} (rc={rc})")
        sys.exit(rc)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--skip-tests", action="store_true")
    p.add_argument("--skip-bench", action="store_true")
    args = p.parse_args()

    if not args.skip_tests:
        run([sys.executable, "-m", "pytest", "tests/", "-q"], label="pytest")

    dryrun_code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_platform_name', 'cpu');"
        "from __graft_entry__ import dryrun_multichip;"
        "dryrun_multichip(8)")
    run([sys.executable, "-c", dryrun_code],
        env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        label="dryrun_multichip(8) on virtual CPU mesh")

    if not args.skip_bench:
        run([sys.executable, "tools/check_nms_tpu.py"],
            label="compiled Pallas NMS exactness (real device)")
        run([sys.executable, "tools/check_gather_tpu.py"],
            label="compiled Pallas gather bit-exactness (real device)")
        run([sys.executable, "bench.py"], label="bench (real device)")

    print("\nALL CHECKS PASSED")


if __name__ == "__main__":
    main()
