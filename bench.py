#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Flagship config (BASELINE.json): homography + robust Charbonnier + 5-scale
pyramid at 584x388 RGB, batched. vs_baseline is relative to the reference
numpy implementation's stored measurement at this image size (10.13 s/pair
for its cheapest config; see eval/benchmarks.py docstring).
"""

import json
import sys


def main() -> int:
    from inverse_compositional_algorithm_tpu.eval.benchmarks import run_benchmark
    from inverse_compositional_algorithm_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    result = run_benchmark()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
