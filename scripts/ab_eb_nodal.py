"""A/B the EB nodal projection paths on the poiseuille_cyl_bingham
bench deck: the precomputed 27-point coarse stencil (default) vs the
legacy 2x-DOF octant-lattice solve (INCFLO_EB_NODAL=fine).

Run each in its own process for a clean jit cache:
    python scripts/ab_eb_nodal.py            # both
    INCFLO_EB_NODAL=fine python scripts/ab_eb_nodal.py one
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        env_mode = os.environ.get("INCFLO_EB_NODAL", "stencil")
        sys.stderr.write(f"mode={env_mode}\n")
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env={**os.environ, "INCFLO_BENCH_CONFIG":
                 "poiseuille_cyl_bingham", "INCFLO_BENCH_ALL": "0"},
            capture_output=True, text=True, cwd=ROOT, timeout=3000)
        sys.stderr.write(r.stderr[-500:])
        print(r.stdout.strip().splitlines()[-1])
        return
    for mode in ("stencil", "fine"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one"],
            env={**os.environ, "INCFLO_EB_NODAL": mode},
            capture_output=True, text=True, timeout=3600)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), "{}")
        d = json.loads(line)
        print(f"{mode:8s}  {d.get('value', 0)/1e6:8.2f} M cells/s   "
              f"{1e3*d.get('sec_per_step', 0):8.2f} ms/step")


if __name__ == "__main__":
    main()
