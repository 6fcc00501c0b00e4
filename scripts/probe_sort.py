"""Measure raw TPU costs of the fused step's building blocks: sorts,
duplicate scatter-adds, one-hot segment sums, nonzero compaction,
15x15 inverses, while-loop probe rounds.  Each op is looped 50x inside
ONE jitted program with a data dependence, so per-op cost =
(total - dispatch floor) / 50 — immune to the ~30 ms tunnel RTT."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

REPS = 50


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    n = 5
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    per = (time.time() - t0) / n / REPS * 1e6
    print(f"{name:44s} {per:9.1f} us/op", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    C = 1 << 15

    for K in (2048, 8192):
        keys = jnp.asarray(rng.integers(0, 1 << 30, K), jnp.int32)

        def body_sort(x):
            for _ in range(REPS):
                x = jnp.argsort(x)  # data-dependent chain
            return x

        timed(f"argsort int32 K={K}", body_sort, keys)

        def body_sortv(x):
            for _ in range(REPS):
                x = jnp.sort(x)
                x = x ^ 1  # break idempotence
            return x

        timed(f"sort int32 K={K}", body_sortv, keys)

    for K in (1024, 2048, 3072):
        idx = jnp.asarray(rng.integers(0, C, K), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(K, 10)), jnp.float32)
        tbl = jnp.zeros((C * 10, 10), jnp.float32)

        def body_scatter(t, ix, v):
            for r in range(REPS):
                t = t.at[ix + r].add(v, mode="drop")
            return t

        timed(f"scatter-add dup rows K={K} into (10C,10)",
              body_scatter, tbl, idx, vals)

        def body_gather(t, ix):
            s = jnp.zeros((K, 10), jnp.float32)
            for r in range(REPS):
                s = s + t[ix + r]
            return s

        timed(f"gather rows K={K} from (10C,10)", body_gather, tbl, idx)

    from voxelslam_tpu.ops import segsum

    for K in (2048, 8192):
        idx = jnp.sort(jnp.asarray(rng.integers(0, C, K), jnp.int32))
        vals = jnp.asarray(rng.normal(size=(K, 10)), jnp.float32)
        tbl = jnp.zeros((C, 10), jnp.float32)

        def body_seg(t, ix, v):
            for r in range(REPS):
                t = segsum.sorted_segment_add(t, ix, v + r)
            return t

        timed(f"sorted_segment_add K={K}", body_seg, tbl, idx, vals)

    mask = jnp.asarray(rng.random(C) < 0.05)

    def body_nonzero(m):
        acc = jnp.zeros((2048,), jnp.int32)
        for r in range(REPS):
            (i,) = jnp.nonzero(m ^ (acc[0] > C), size=2048, fill_value=C)
            acc = acc + i
        return acc

    timed("nonzero(size=2048) over C=2^15", body_nonzero, mask)

    A = jnp.asarray(rng.normal(size=(15, 15)), jnp.float32)
    A = A @ A.T + 15 * jnp.eye(15)

    def body_inv(a):
        for _ in range(REPS):
            a = jnp.linalg.inv(a) + jnp.eye(15)
        return a

    timed("inv 15x15", body_inv, A)

    def body_solve(a):
        x = jnp.ones((15,), jnp.float32)
        for _ in range(REPS):
            x = jnp.linalg.solve(a + x[0] * jnp.eye(15), x)
        return x

    timed("solve 15x15 (1 rhs)", body_solve, A)

    B = jnp.asarray(rng.normal(size=(153, 153)), jnp.float32)
    B = B @ B.T + 153 * jnp.eye(153)

    def body_solve153(a):
        x = jnp.ones((153,), jnp.float32)
        for _ in range(REPS):
            x = jnp.linalg.solve(a + x[0] * jnp.eye(153), x)
        return x

    timed("solve 153x153", body_solve153, B)

    # eigh3 over V=2048 (closed form)
    from voxelslam_tpu.ops import eigh3

    S = jnp.asarray(rng.normal(size=(2048, 3, 3)), jnp.float32)
    S = S @ jnp.swapaxes(S, -1, -2) + 3 * jnp.eye(3)

    def body_eigh(s):
        for _ in range(REPS):
            w, V = eigh3.eigh3(s)
            s = s + w[..., None] * 1e-9
        return s

    timed("eigh3 batched V=2048", body_eigh, S)


if __name__ == "__main__":
    main()
