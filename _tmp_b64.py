import json
from inverse_compositional_algorithm_tpu.eval.benchmarks import run_benchmark
from inverse_compositional_algorithm_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
for b in (32, 64):
    r = run_benchmark(batch=b, full=False)
    print(json.dumps(r), flush=True)
