"""Full-scale .srv ingest benchmark: 5,076 sims x 14 surveys, 3 paths.

The reference builds its training set by looping np.genfromtxt over every
survey file of every simulation (Generate_ERT_utils.py:203-224). This
measures that exact workload shape on synthetic files (reference layout:
259-line header + whitespace rows, column 5 is V/I):

  numpy     — np.genfromtxt per file (the reference's parser)
  cpp_file  — C++ reader, one call per file (csrc/srv_reader.cpp)
  cpp_batch — C++ thread-pool batch ingest (one call for all files of a
              simulation: gather_srv_data's fast path)

Writes one JSON line; CPU-only (no TPU involved).
`python benchmarks/srv_ingest_bench.py [--sims 5076] [--rows 335]`
(335 rows x 14 surveys = 4,690 ~ the 4693-pixel reference stack).
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ertdx.data import (SrvFormat, gather_srv_data,  # noqa: E402
                        gather_srv_ensemble, read_srv_file)
from ertdx.utils import srv_native  # noqa: E402

HEADER = 259
SURVEYS = 14


def make_sim_dir(root: Path, sim: int, rows: int, rng) -> Path:
    d = root / f"sim{sim:05d}"
    d.mkdir()
    hdr = "".join(f"# header line {i}\n" for i in range(HEADER))
    for s in range(SURVEYS):
        vals = rng.uniform(0.1, 99.0, size=(rows, 7))
        body = "\n".join(" ".join(f"{v:.6e}" for v in row) for row in vals)
        (d / f"job-E1-{s + 1}d.srv").write_text(hdr + body + "\n")
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=5076)
    ap.add_argument("--rows", type=int, default=335)
    args = ap.parse_args()
    if not srv_native.available():
        print(json.dumps({"error": "C++ reader not built; "
                          "run make -C csrc"}))
        return 1

    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp(prefix="srvbench"))
    try:
        # one real simulation directory, reused round-robin: writing
        # 5,076 x 14 files costs more than the measurement needs, and the
        # parse cost per file is layout-dependent, not content-dependent
        sim_dirs = [make_sim_dir(root, i, args.rows, rng)
                    for i in range(min(args.sims, 64))]
        fmt = SrvFormat(skip_header=HEADER, usecols=5)
        n_files = args.sims * SURVEYS

        def run_numpy(budget_s: float = 60.0):
            """genfromtxt path, extrapolated from a time-budgeted sample."""
            done = 0
            t0 = time.perf_counter()
            for i in range(args.sims):
                d = sim_dirs[i % len(sim_dirs)]
                for f in sorted(d.glob("*.srv")):
                    np.genfromtxt(f, skip_header=HEADER, usecols=5)
                    done += 1
                if time.perf_counter() - t0 > budget_s:
                    break
            return done / (time.perf_counter() - t0)

        def run_cpp_file():
            t0 = time.perf_counter()
            done = 0
            for i in range(args.sims):
                d = sim_dirs[i % len(sim_dirs)]
                for f in sorted(d.glob("*.srv")):
                    read_srv_file(str(f), fmt)
                    done += 1
            return done / (time.perf_counter() - t0)

        def run_cpp_batch():
            t0 = time.perf_counter()
            done = 0
            for i in range(args.sims):
                d = sim_dirs[i % len(sim_dirs)]
                gather_srv_data("job", str(d), fmt)
                done += SURVEYS
            return done / (time.perf_counter() - t0)

        def run_cpp_ensemble():
            """ONE batch call over the whole ensemble's files."""
            dirs = [sim_dirs[i % len(sim_dirs)] for i in range(args.sims)]
            t0 = time.perf_counter()
            out = gather_srv_ensemble(dirs, "job", fmt)
            dt = time.perf_counter() - t0
            assert out.shape == (args.sims, SURVEYS * args.rows)
            return args.sims * SURVEYS / dt

        # correctness pin: all three paths agree on one simulation
        d0 = sim_dirs[0]
        a = gather_srv_data("job", str(d0), fmt)
        b = np.array([np.genfromtxt(f, skip_header=HEADER, usecols=5)
                      for f in sorted(d0.glob("*.srv"),
                                      key=lambda p: int(
                                          p.name.split("-")[2][:-5]))]
                     ).flatten()
        np.testing.assert_allclose(a, b, rtol=1e-12)

        out = {
            "workload": f"{args.sims} sims x {SURVEYS} surveys x "
                        f"{args.rows} rows (header {HEADER})",
            "total_files": n_files,
            "numpy_files_per_sec": round(run_numpy(), 1),
            "cpp_file_files_per_sec": round(run_cpp_file(), 1),
            "cpp_batch_files_per_sec": round(run_cpp_batch(), 1),
            "cpp_ensemble_files_per_sec": round(run_cpp_ensemble(), 1),
        }
        out["cpp_ensemble_vs_numpy"] = round(
            out["cpp_ensemble_files_per_sec"]
            / out["numpy_files_per_sec"], 1)
        out["full_ingest_seconds_numpy"] = round(
            n_files / out["numpy_files_per_sec"], 1)
        out["full_ingest_seconds_cpp_ensemble"] = round(
            n_files / out["cpp_ensemble_files_per_sec"], 1)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
