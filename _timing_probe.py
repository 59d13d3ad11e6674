import time, json
import numpy as np
from inverse_compositional_algorithm_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from inverse_compositional_algorithm_tpu.config import AlignConfig
from inverse_compositional_algorithm_tpu.eval.benchmarks import make_bench_batch
from inverse_compositional_algorithm_tpu.models.api import _align_batched
from inverse_compositional_algorithm_tpu.ops.normal_equations import RobustLoss
from inverse_compositional_algorithm_tpu.ops.transforms import TransformType

cfg = AlignConfig(transform=TransformType.HOMOGRAPHY, robust=RobustLoss.CHARBONNIER, nscales=5)
i1, i2, _ = make_bench_batch(16, 388, 584, TransformType.HOMOGRAPHY)
p0 = jnp.zeros((16, 8), jnp.float32)
i1, i2, p0 = jax.device_put((i1, i2, p0))
res = _align_batched(i1, i2, p0, cfg); jax.block_until_ready(res.p)
print("warmed", flush=True)

t0 = time.perf_counter()
for _ in range(10):
    res = _align_batched(i1, i2, p0, cfg)
    jax.block_until_ready(res.p)
t_block = (time.perf_counter() - t0) / 10

t0 = time.perf_counter()
for _ in range(10):
    res = _align_batched(i1, i2, p0, cfg)
    _ = jax.device_get(res.p)
t_get = (time.perf_counter() - t0) / 10

# also block on ALL outputs (di/iw are the big ones)
t0 = time.perf_counter()
for _ in range(10):
    res = _align_batched(i1, i2, p0, cfg)
    jax.block_until_ready(res)
t_all = (time.perf_counter() - t0) / 10

print(json.dumps({"block_p_ms": t_block*1e3, "device_get_p_ms": t_get*1e3, "block_all_ms": t_all*1e3}))
