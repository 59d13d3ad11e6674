import json
from inverse_compositional_algorithm_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
from inverse_compositional_algorithm_tpu.eval.benchmarks import run_benchmark
for b in (16, 128):
    print(json.dumps(run_benchmark(batch=b, repeats=5)), flush=True)
