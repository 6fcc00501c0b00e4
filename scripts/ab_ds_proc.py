"""One-process-one-variant fused-step timing (sort|hash downsample).

The in-process A/B (ab_ds_fused.py) needs `jax.clear_caches()` between
variants (the nested jitted steady_step caches its jaxpr), and on a
moody tunnel the clear reliably precedes UNAVAILABLE worker faults.
This variant monkeypatches BEFORE the first trace and times exactly one
configuration, so each process is disposable; the driver loop
alternates processes (sort, hash, sort, hash) for a paired-ish signal.
Cross-process tunnel variance is ~2x over hours (CLAUDE.md) but
back-to-back runs minutes apart are comparable; alternation covers the
drift direction.

Usage: python scripts/ab_ds_proc.py {sort|hash} [n_timing_batches]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
if len(sys.argv) < 2:
    sys.exit("usage: ab_ds_proc.py {sort|hash} [n]")
variant = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
sys.argv = [sys.argv[0]]  # bisect_tpu reads argv for shapes

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from voxelslam_tpu.ops import downsample as ds  # noqa: E402

ds.voxel_average = {
    "sort": ds.voxel_average_sort,
    "hash": ds.voxel_average_hash,
}[variant]

from bisect_tpu import make_problem  # noqa: E402
from bisect_ab import run  # noqa: E402


def main():
    print("device:", jax.devices()[0], flush=True)
    ppl, imu_noise, carry, flats = make_problem()
    t = run(variant, ppl, imu_noise, carry, flats, n=n)
    print(f"RESULT {variant} {t:.3f}", flush=True)


if __name__ == "__main__":
    main()
