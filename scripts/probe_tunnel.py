"""Measure host<->device transfer cost over the tunneled TPU link:
upload of a scan batch, download of a StepOutputs-sized pytree, and
empty-dispatch round-trip — separates tunnel overhead from compute
when reading bench stage times."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

def timeit(name, fn, n=10):
    fn(); fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    dt = (time.time() - t0) / n * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)

def main():
    print("device:", jax.devices()[0], flush=True)
    up = np.zeros((16, 33288), np.float32)  # bench batch upload (2.1MB)
    timeit("upload 2.1MB (jnp.asarray+block)",
           lambda: jax.block_until_ready(jnp.asarray(up)))
    small = np.zeros((16, 4164), np.float32)
    timeit("upload 266KB", lambda: jax.block_until_ready(jnp.asarray(small)))
    dn = jax.device_put(np.zeros((16, 2048, 3), np.int16))
    rest = jax.device_put(np.zeros((16, 200), np.float32))
    timeit("download 197KB int16 + 12KB",
           lambda: (jax.device_get(dn), jax.device_get(rest)))
    one = jax.device_put(np.zeros((), np.float32))
    f = jax.jit(lambda x: x + 1)
    timeit("empty dispatch round-trip",
           lambda: jax.block_until_ready(f(one)))
    big_dn = jax.device_put(np.zeros((16, 2048, 3), np.float32))
    timeit("download 393KB f32", lambda: jax.device_get(big_dn))

if __name__ == "__main__":
    main()
