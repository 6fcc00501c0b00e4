"""In-process A/B of the downsample implementation INSIDE the fused
steady step (standalone-program timings are dispatch-overhead-bound
and showed a wash; the bisect showed the stage at 4.05 ms/scan fused,
so the fused program is where the comparison is meaningful).

Monkeypatches ops.downsample.voxel_average between variants and
clears jit caches (bisect_tpu.py rationale), alternating twice.

Usage: python scripts/ab_ds_fused.py [n_ds max_ba log2cap n_raw]
       (defaults to bench shapes 2048 2048 14 8192)
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
if len(sys.argv) == 1:
    sys.argv += ["2048", "2048", "14", "8192"]  # bench shapes

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bisect_tpu import make_problem  # noqa: E402
from bisect_ab import run  # noqa: E402

from voxelslam_tpu.ops import downsample as ds  # noqa: E402


def main():
    import time

    print("device:", jax.devices()[0], flush=True)
    ppl, imu_noise, carry, flats = make_problem()
    variants = {
        "sort": ds.voxel_average_sort,
        "hash": ds.voxel_average_hash,
    }
    res = {}
    for rnd in range(2):
        for name, fn in variants.items():
            ds.voxel_average = fn
            jax.clear_caches()
            # the tunneled worker intermittently faults under compile
            # bursts (UNAVAILABLE / FAILED_PRECONDITION); retry the
            # variant after a cooldown instead of losing the session
            for attempt in range(3):
                try:
                    t = run(f"{name} r{rnd}", ppl, imu_noise,
                            carry, flats)
                    res.setdefault(name, []).append(t)
                    break
                except Exception as e:
                    print(f"[{name} r{rnd}] attempt {attempt}: "
                          f"{type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    time.sleep(60)
                    jax.clear_caches()
    ds.voxel_average = ds.voxel_average_sort
    for name, ts in res.items():
        print(f"{name}: " + ", ".join(f"{t:.2f}" for t in ts)
              + f" -> mean {sum(ts) / len(ts):.2f} ms/scan", flush=True)


if __name__ == "__main__":
    main()
