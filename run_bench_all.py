"""Run EVERY bench mode and collect the JSON rows into one committed
artifact (VERDICT.md round 2, item 2): gram / solve / chol @ n=10240 AND
n=32768 / cg100k (mean+variance) / scaling.

Each mode runs in its own subprocess (bench.py reads GP_BENCH_MODE once at
import; a fresh process also keeps one mode's compile cache pressure and
device state from polluting the next measurement). Rows are appended to the
output JSON as they land, so a crash mid-sweep still leaves a valid partial
artifact.

Usage:
    python run_bench_all.py [--out BENCH_ALL_r03.json] [--skip MODE ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

MODES = [
    # (mode, extra env, per-mode timeout seconds)
    ("gram", {}, 1200),
    ("solve", {}, 1800),
    ("chol", {"GP_BENCH_N": "10240"}, 1800),
    ("chol", {"GP_BENCH_N": "32768", "GP_BENCH_SKIP_BASELINE": "1"}, 2400),
    ("cg100k", {}, 2400),
    ("scaling", {}, 1800),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_ALL_r03.json")
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()

    rows = []
    meta = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    try:
        import jax

        meta["device"] = str(jax.devices()[0].device_kind)
    except Exception as e:  # pragma: no cover
        meta["device"] = f"unavailable: {e}"

    for mode, extra, tmo in MODES:
        key = mode + ("" if "GP_BENCH_N" not in extra else f"_n{extra['GP_BENCH_N']}")
        if mode in args.skip or key in args.skip:
            print(f"[run_bench_all] skip {key}", flush=True)
            continue
        env = dict(os.environ)
        env["GP_BENCH_MODE"] = mode
        env.update(extra)
        print(f"[run_bench_all] running {key} ...", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            timeout=tmo,
        )
        dt = time.time() - t0
        stderr_tail = proc.stderr.strip().splitlines()[-8:]
        if proc.returncode != 0:
            rows.append(
                {
                    "mode": key,
                    "ok": False,
                    "returncode": proc.returncode,
                    "stderr_tail": stderr_tail,
                    "wall_s": round(dt, 1),
                }
            )
            print(f"[run_bench_all] {key} FAILED rc={proc.returncode}", flush=True)
        else:
            for line in proc.stdout.strip().splitlines():
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                rec["mode"] = key
                rec["ok"] = True
                rec["wall_s"] = round(dt, 1)
                rows.append(rec)
            print(f"[run_bench_all] {key} done in {dt:.0f}s", flush=True)
        with open(args.out, "w") as f:
            json.dump({"meta": meta, "rows": rows}, f, indent=1)

    bad = [r for r in rows if not r.get("ok")]
    print(f"[run_bench_all] wrote {args.out}: {len(rows)} rows, {len(bad)} failures")
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
