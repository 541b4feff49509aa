import time, jax, jax.numpy as jnp
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
a = jnp.ones((2048, 2048), jnp.bfloat16)
f = jax.jit(lambda x: x @ x)
f(a).block_until_ready()
for trial in range(6):
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(a)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 50
    print(f"trial {trial}: {dt*1e6:8.1f} us/matmul  ({2*2048**3/dt/1e12:6.1f} TFLOP/s)")
    time.sleep(2)
