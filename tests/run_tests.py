#!/usr/bin/env python
"""Test-suite runner (reference analog: tests/run_tests.py).

Wraps pytest with the environment the suite needs (CPU backend, 8
virtual devices for SPMD tests, no TPU-relay registration) plus the
reference wrapper's convenience flags:

    python tests/run_tests.py                # full suite
    python tests/run_tests.py --failed       # rerun last failures
    python tests/run_tests.py --coverage     # with coverage report
    python tests/run_tests.py --junit out.xml
    python tests/run_tests.py -k moe -x      # extra args pass through
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--failed", action="store_true",
                   help="rerun only the last run's failures (--lf)")
    p.add_argument("--coverage", action="store_true",
                   help="run under coverage (requires pytest-cov)")
    p.add_argument("--junit", metavar="FILE", default=None,
                   help="write a junit XML report")
    args, extra = p.parse_known_args()

    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip TPU-relay registration

    cmd = [sys.executable, "-m", "pytest", "-q"]
    if args.failed:
        cmd.append("--lf")
    if args.coverage:
        cmd += ["--cov=minivllm_tpu", "--cov-report=term-missing"]
    if args.junit:
        cmd += ["--junitxml", args.junit]
    cmd += extra or [str(Path(__file__).parent)]
    return subprocess.call(cmd, env=env, cwd=Path(__file__).parent.parent)


if __name__ == "__main__":
    raise SystemExit(main())
