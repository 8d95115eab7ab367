"""Top-level example runner (reference analog: examples.py:37-94).

Usage: python examples.py [name] — with no name, lists available examples.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

EXAMPLES = {
    "cpu": "cpu_inference_opt.py",
    "tpu": "tpu_inference_example.py",
    "batch": "batch_inference_example.py",
    "sampling": "sampling_params_example.py",
    "tp": "tp_example.py",
    "prefix": "prefix_caching_example.py",
    "quant": "quantization_example.py",
    "server": "server_example.py",
    "streaming": "streaming_logprobs_example.py",
    "check": "check_tpu.py",
    "logit-match": "logit_match.py",
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in EXAMPLES:
        print("usage: python examples.py <name> [args...]\n\navailable:")
        for name, f in EXAMPLES.items():
            doc = (Path("examples") / f).read_text().split('"""')[1].strip()
            print(f"  {name:10s} {doc.splitlines()[0]}")
        sys.exit(0 if len(sys.argv) < 2 else 1)
    name = sys.argv[1]
    script = Path(__file__).parent / "examples" / EXAMPLES[name]
    sys.exit(
        subprocess.call(
            [sys.executable, str(script), *sys.argv[2:]],
            cwd=str(script.parent),
        )
    )


if __name__ == "__main__":
    main()
