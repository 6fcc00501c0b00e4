"""Spill-precision A/B (VERDICT r4 #3): ATE before/after finish GBA on
the 60 m stress corpus with the cloud spill ENABLED, across storage
modes f16 (round-4 default), i16 (adaptive-scale int16), f32
(lossless).  Spilled keyframe clouds feed the mid-term fixed reload
and the finish HBA plane fits (loop/manager.py get_cloud), so storage
quantization lands directly in the λ0 chase — the reference spills
full-precision PCDs (voxelslam.cpp:163-174).

Usage:
    python scripts/ab_spill.py [--dir /tmp/stress] [--modes f16,i16,f32]

Generates the corpus once (reused if present), then one full-system
CPU run per mode (clean process each; CPU pinned via cli --platform).
Prints one JSON line per mode and a final summary table to stderr.
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


def ensure_corpus(d):
    ds = os.path.join(d, "dataset")
    if os.path.isdir(ds) and os.path.exists(
        os.path.join(d, "stress_gt.npz")
    ):
        log(f"reusing corpus at {d}")
        return ds
    subprocess.run(
        [sys.executable, os.path.join(HERE, "stress_corpus.py"), "gen",
         "--dir", d],
        check=True,
    )
    subprocess.run(
        [sys.executable, os.path.join(HERE, "convert_bag.py"),
         os.path.join(d, "stress.bag"), ds,
         "--lidar-topic", "/velodyne_points", "--imu-topic", "/imu/data",
         "--lidar-type", "VELODYNE", "--filter-num", "1",
         "--blind", "0.1"],
        check=True,
    )
    return ds


def run_mode(d, ds, mode):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "stress_corpus", os.path.join(HERE, "stress_corpus.py")
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)
    spill_dir = os.path.join(d, f"spill_{mode}")
    os.makedirs(spill_dir, exist_ok=True)
    cfg_path = os.path.join(d, f"config_spill_{mode}.yaml")
    with open(cfg_path, "w") as f:
        f.write(sc.CONFIG_YAML.replace(
            'bagname: "stress"',
            f'bagname: "stress"\n  spill_dir: "{spill_dir}"',
        ))
    env = dict(os.environ)
    env["VOXELSLAM_SPILL_MODE"] = mode
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "voxelslam_tpu.cli", "run", ds,
         "--config", cfg_path,
         "--gt", os.path.join(d, "stress_gt.npz"), "--finish",
         "--platform", "cpu",
         "--out", os.path.join(d, f"session_{mode}")],
        cwd=ROOT, env=env, capture_output=True, text=True,
    )
    sys.stderr.write(r.stderr[-2500:])
    out = {}
    for line in r.stdout.strip().splitlines():
        if line.startswith("{"):
            out = json.loads(line)
    out["mode"] = mode
    out["wall_s"] = round(time.time() - t0, 1)
    out["rc"] = r.returncode
    sz = 0
    for fn in os.listdir(spill_dir):
        sz += os.path.getsize(os.path.join(spill_dir, fn))
    out["spill_mb"] = round(sz / 1e6, 1)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/stress")
    ap.add_argument("--modes", default="f16,i16,f32")
    args = ap.parse_args()
    ds = ensure_corpus(args.dir)
    rows = [run_mode(args.dir, ds, m) for m in args.modes.split(",")]
    log(f"{'mode':<6} {'ate_m':>8} {'ate_gba_m':>10} {'loops':>6} "
        f"{'spill_mb':>9} {'wall_s':>7}")
    for r in rows:
        log(f"{r['mode']:<6} {r.get('ate_m', -1):>8.4f} "
            f"{r.get('ate_after_gba_m', -1):>10.4f} "
            f"{r.get('loops', -1):>6} {r['spill_mb']:>9.1f} "
            f"{r['wall_s']:>7.1f}")


if __name__ == "__main__":
    main()
