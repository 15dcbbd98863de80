"""Experiment harness — equivalent of the reference's ``run_exps.sh`` +
``eval_tum.sh``/``eval_co-fusion.sh``: runs the pipeline headless over a
set of sequences, exports results, and evaluates ATE/RPE against ground
truth where available.

Sequence spec file (JSON list) entries:
  {"name": "fr3_sitting_static", "path": "/data/tum/fr3_sitting_static",
   "kind": "tum", "config": "configs/default.cfg",
   "maskdir": null, "groundtruth": "groundtruth.txt",
   "objects": {"1": "gt-car.txt"}}

Usage:
  python scripts/run_exps.py EXPS.json -e /tmp/exps_out [--frames N]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("spec", help="JSON experiment spec")
    ap.add_argument("-e", "--exportdir", required=True)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    with open(args.spec) as f:
        exps = json.load(f)

    env = dict(os.environ, PYTHONPATH=ROOT + ":" +
               os.environ.get("PYTHONPATH", ""))
    results = {}
    for exp in exps:
        name = exp["name"]
        out = os.path.join(args.exportdir, name)
        cmd = [sys.executable, "-m", "emfusion_tpu.apps.run_emfusion",
               "--background", "-e", out]
        cmd += (["-t", exp["path"]] if exp.get("kind", "tum") == "tum"
                else ["-d", exp["path"]])
        if exp.get("config"):
            cmd += ["-c", os.path.join(ROOT, exp["config"])]
        if exp.get("maskdir"):
            cmd += ["-m", exp["maskdir"]]
        if args.frames:
            cmd += ["--frames", str(args.frames)]
        if args.platform:
            cmd += ["--platform", args.platform]
        print(f"=== {name}: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, env=env)
        if proc.returncode != 0:
            results[name] = {"error": f"exit {proc.returncode}"}
            continue

        gt = exp.get("groundtruth")
        if gt:
            gt_path = gt if os.path.isabs(gt) else \
                os.path.join(exp["path"], gt)
            ecmd = [sys.executable, "-m", "emfusion_tpu.apps.evaluate",
                    out, gt_path, "--json"]
            for oid, ogt in (exp.get("objects") or {}).items():
                ecmd += ["--obj", oid, ogt]
            ev = subprocess.run(ecmd, env=env, capture_output=True,
                                text=True)
            try:
                results[name] = json.loads(ev.stdout.strip())
            except json.JSONDecodeError:
                results[name] = {"error": ev.stdout + ev.stderr}
        else:
            results[name] = {"status": "completed (no ground truth)"}

    os.makedirs(args.exportdir, exist_ok=True)
    with open(os.path.join(args.exportdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
