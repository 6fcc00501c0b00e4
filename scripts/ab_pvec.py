"""down_sampling_pvec default A/B (VERDICT r4 missing #3 / next #6).

The reference ALWAYS averages (point, var) pairs on the LBA path
(down_sampling_pvec, voxel_map.hpp:24-65); our `pvec_downsample`
config defaults to 0 (recompute the noise model at the representative
point).  Measure the ATE effect on the 60 m stress corpus and set the
default by the number.

Usage: python scripts/ab_pvec.py [--dir /tmp/stress]
Reuses the corpus from ab_spill.py / stress_corpus.py if present.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/stress")
    args = ap.parse_args()

    sys.path.insert(0, HERE)
    from ab_spill import ensure_corpus
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "stress_corpus", os.path.join(HERE, "stress_corpus.py")
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)

    ds = ensure_corpus(args.dir)
    rows = []
    for pvec in (0, 1):
        cfg_path = os.path.join(args.dir, f"config_pvec{pvec}.yaml")
        with open(cfg_path, "w") as f:
            f.write(sc.CONFIG_YAML.replace(
                "cov_gyr: 0.01",
                f"cov_gyr: 0.01\n  pvec_downsample: {pvec}",
            ))
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "voxelslam_tpu.cli", "run", ds,
             "--config", cfg_path,
             "--gt", os.path.join(args.dir, "stress_gt.npz"), "--finish",
             "--platform", "cpu",
             "--out", os.path.join(args.dir, f"session_pvec{pvec}")],
            cwd=ROOT, capture_output=True, text=True,
        )
        sys.stderr.write(r.stderr[-2000:])
        out = {}
        for line in r.stdout.strip().splitlines():
            if line.startswith("{"):
                out = json.loads(line)
        out["pvec_downsample"] = pvec
        out["wall_s"] = round(time.time() - t0, 1)
        out["rc"] = r.returncode
        print(json.dumps(out), flush=True)
        rows.append(out)
    log(f"{'pvec':<5} {'ate_m':>8} {'ate_gba_m':>10} {'loops':>6} "
        f"{'wall_s':>7}")
    for r in rows:
        log(f"{r['pvec_downsample']:<5} {r.get('ate_m', -1):>8.4f} "
            f"{r.get('ate_after_gba_m', -1):>10.4f} "
            f"{r.get('loops', -1):>6} {r['wall_s']:>7.1f}")


if __name__ == "__main__":
    main()
