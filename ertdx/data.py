"""L1 — Data layer: dataset prep, splits, host->device feed, file I/O.

Design:
  * All dataset state is explicit numpy (host) + serializable scaler pytrees.
  * The training feed is a seeded, epoch-reshuffled iterator of fixed-shape
    device batches — `jax.device_put` with an optional batch-axis
    NamedSharding so multi-chip DP feeds shard on the host side.
  * `.srv` parsing is configurable (header lines / column / filename time
    token), fixing the reference's hard-coded fragility
    (Generate_ERT_utils.py:203-224; README.md:28 warns these vary).
    A native C++ fast path is used when available (ertdx.utils.srv_native).

Parity targets:
  * DiffusionDataset semantics: squeeze (N,29,1)->(N,29), logit transform of
    scaled params, ERT transposed so surveys are channels
    (reference: ERT_Conditional_Diffusion.py:55-78) — here feature-last
    (N, L, C) for TPU;
  * inline prep pipeline: per-column MinMax over flattened params AND over
    flattened ERT (reference: ERT_Conditional_Diffusion.py:229-261);
  * 80/10/10 split (reference: ERT_Conditional_Diffusion.py:270-274);
  * simulation re-ingest with most-common-shape filtering
    (reference: ERT_Conditional_Diffusion.py:453-517);
  * flat-vector -> (measurements, surveys) refold
    (reference: ERT_Conditional_Diffusion.py:705-731).
"""
from __future__ import annotations

import dataclasses
import os
from collections import Counter
from pathlib import Path
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from .transforms import MinMaxScaler, transform_to_unconstrained


# --------------------------------------------------------------------------
# .srv survey files
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SrvFormat:
    """Configurable .srv layout (reference hard-codes all three fields;
    its own README warns they vary across PFLOTRAN setups,
    /root/reference/README.md:28 — see docs/MIGRATION.md for pointing
    the ingest at a real corpus)."""

    skip_header: int = 259
    usecols: int = 5
    # filename like '<prefix>-<x>-<days>d...' -> time token index after
    # splitting on '-', then strip at 'd'. Reference:
    # Generate_ERT_utils.py:212.
    time_token_index: int = 2
    # guard against silent header-drift corruption: a skip_header SMALLER
    # than the real header feeds text lines to the numpy parser, which
    # yields NaN rows without complaint (np.genfromtxt). True (default)
    # raises with a skip_header hint instead; set False only for corpora
    # with legitimate non-finite measurements.
    require_finite: bool = True


def _check_finite(arr: np.ndarray, where: str, fmt: "SrvFormat") -> None:
    if fmt.require_finite and not np.isfinite(arr).all():
        bad = int(np.size(arr) - np.isfinite(arr).sum())
        raise ValueError(
            f"{where}: {bad} non-finite values parsed — usually "
            f"skip_header={fmt.skip_header} is smaller than the file's "
            f"real header (text rows parse as NaN), or the data column "
            f"index usecols={fmt.usecols} is wrong. Adjust SrvFormat, or "
            f"set require_finite=False for corpora with genuine "
            f"non-finite measurements.")


def _srv_time(fname: str, fmt: SrvFormat) -> float:
    parts = fname.split("-")
    if len(parts) <= fmt.time_token_index:
        raise ValueError(
            f".srv filename {fname!r} has no '-'-separated time token at "
            f"index {fmt.time_token_index}; expected names like "
            f"'<prefix>-E1-<days>d.srv' (adjust SrvFormat.time_token_index)")
    token = parts[fmt.time_token_index].split("d")[0]
    try:
        return float(token)
    except ValueError as e:
        raise ValueError(
            f".srv filename {fname!r}: token {token!r} is not a survey "
            f"time in days") from e


def read_srv_file(path: str, fmt: SrvFormat = SrvFormat()) -> np.ndarray:
    """Read one .srv file's data column. Uses the C++ parser if built."""
    try:
        from .utils import srv_native
        out = srv_native.read_srv_column(path, fmt.skip_header, fmt.usecols)
        if out is not None:
            _check_finite(out, str(path), fmt)
            return out
    except ImportError:
        pass
    out = np.genfromtxt(path, skip_header=fmt.skip_header,
                        usecols=fmt.usecols)
    _check_finite(out, str(path), fmt)
    return out


def gather_srv_data(prefix: str, directory: str = ".",
                    fmt: SrvFormat = SrvFormat()) -> np.ndarray:
    """Collect all '<prefix>*.srv' files sorted by survey time; flatten.

    Reference: Generate_ERT_utils.py:203-224 (ERTDataHandler.gather_data,
    which globs the CWD; here the directory is explicit so concurrent runs
    can use isolated workdirs — see SURVEY.md §5.2 on the race it removes).
    """
    # lexicographic pre-sort + stable time sort: equal time tokens get
    # a deterministic order regardless of os.listdir / quicksort ties
    fnames = sorted(f for f in os.listdir(directory)
                    if f.startswith(prefix) and f.endswith(".srv"))
    if not fnames:
        raise FileNotFoundError(
            f"no '{prefix}*.srv' files in {directory!r}")
    times = [_srv_time(f, fmt) for f in fnames]
    order = np.argsort(times, kind="stable")
    paths = [os.path.join(directory, fnames[i]) for i in order]
    # C++ thread-pool batch parse (csrc/srv_reader.cpp); per-file /
    # numpy fallback preserves behavior when the extension is absent
    from .utils import srv_native
    res = srv_native.read_srv_batch(paths, fmt.skip_header, fmt.usecols,
                                    return_counts=True)
    if res is not None:
        batch, counts = res
        if len(set(counts.tolist())) > 1:
            # match the numpy fallback, where np.array(ragged) raises —
            # the fast path must not silently shift rows across surveys
            raise ValueError(
                f"ragged .srv files in {directory!r}: per-file rows "
                f"{sorted(set(counts.tolist()))}")
        _check_finite(batch, f"{prefix}*.srv in {directory!r}", fmt)
        return batch
    data = [read_srv_file(p, fmt) for p in paths]
    return np.array(data).flatten()


def gather_srv_ensemble(directories, prefix: str,
                        fmt: SrvFormat = SrvFormat()) -> np.ndarray:
    """Batch-ingest EVERY simulation's survey files in one C++ call.

    The reference ingests the training ensemble as a serial
    np.genfromtxt loop over thousands of files (Generate_ERT_utils.py:
    203-224, called per simulation). gather_srv_data already batches one
    simulation's ~14 files, but at that granularity the thread pool
    spins up for ~2 ms of work; this entry point flattens ALL
    simulations' files into ONE srv_read_batch call so the pool
    amortizes across the full ensemble (measured ~4x over per-sim calls
    at 5,076 x 14 — benchmarks/srv_ingest_bench.py).

    directories: iterable of per-simulation dirs. Every simulation must
    yield the same per-file row count and file count (enforced; the
    reference's most-common-shape filter runs downstream on .npy stores,
    load_simulation_data). Returns (n_sims, files_per_sim * rows).
    """
    from .utils import srv_native

    dirs = [str(d) for d in directories]
    all_paths = []
    per_sim = None
    for d in dirs:
        fnames = sorted(f for f in os.listdir(d)
                        if f.startswith(prefix) and f.endswith(".srv"))
        if not fnames:
            raise FileNotFoundError(f"no '{prefix}*.srv' files in {d!r}")
        times = [_srv_time(f, fmt) for f in fnames]
        order = np.argsort(times, kind="stable")
        paths = [os.path.join(d, fnames[i]) for i in order]
        if per_sim is None:
            per_sim = len(paths)
        elif len(paths) != per_sim:
            raise ValueError(
                f"{d!r} has {len(paths)} survey files, expected {per_sim}")
        all_paths.extend(paths)

    res = srv_native.read_srv_batch(all_paths, fmt.skip_header,
                                    fmt.usecols, return_counts=True)
    if res is None:                         # extension absent: fall back
        parts = [read_srv_file(p, fmt) for p in all_paths]
        counts = np.array([p.size for p in parts], dtype=np.int64)
        batch = np.concatenate(parts)
    else:
        batch, counts = res
    # uniform per-file rows: total-size divisibility alone would let a
    # truncated survey silently shift rows across simulations
    if len(set(counts.tolist())) > 1:
        bad = {all_paths[i]: int(c) for i, c in enumerate(counts)
               if c != counts[0]}
        raise ValueError(
            f"ragged ensemble: per-file row counts differ from "
            f"{int(counts[0])}: {dict(list(bad.items())[:4])}")
    _check_finite(batch, f"{prefix}*.srv ensemble ({len(dirs)} dirs)", fmt)
    return batch.reshape(len(dirs), -1)


class ERTDataHandler:
    """Compatibility shim mirroring the reference API."""

    def __init__(self, directory: str = ".", fmt: SrvFormat = SrvFormat()):
        self.directory = directory
        self.fmt = fmt

    def gather_data(self, prefix: str) -> np.ndarray:
        return gather_srv_data(prefix, self.directory, self.fmt)


# --------------------------------------------------------------------------
# Simulation-results re-ingest
# --------------------------------------------------------------------------

def load_simulation_data(base_folder, number_of_simulations: int,
                         verbose: bool = True
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Load simulation_{i:04d}/{data,parameters}.npy dirs, keeping only runs
    whose shapes match the most common shape; report valid/discarded/missing.

    Reference: ERT_Conditional_Diffusion.py:453-517.
    """
    base_path = Path(base_folder)
    shapes_data, shapes_params, present = [], [], []
    missing = []
    for i in range(number_of_simulations):
        sim = base_path / f"simulation_{i:04d}"
        try:
            d = np.load(sim / "data.npy")
            p = np.load(sim / "parameters.npy")
        except FileNotFoundError:
            missing.append(i)
            continue
        shapes_data.append(d.shape)
        shapes_params.append(p.shape)
        present.append((i, d, p))

    if not present:
        raise FileNotFoundError(f"no simulations found under {base_folder}")

    common_d = Counter(shapes_data).most_common(1)[0][0]
    common_p = Counter(shapes_params).most_common(1)[0][0]

    all_data, all_params, discarded = [], [], []
    for i, d, p in present:
        if d.shape == common_d and p.shape == common_p:
            all_data.append(d)
            all_params.append(p)
        else:
            discarded.append((i, d.shape, p.shape))

    if verbose:
        print(f"Most common data shape: {common_d}")
        print(f"Most common parameter shape: {common_p}")
        print(f"Valid simulations: {len(all_data)}")
        print(f"Discarded simulations: {len(discarded)}")
        print(f"Missing folders: {len(missing)}")
        for i, ds, ps in discarded:
            print(f"simulation_{i:04d}: data{ds}, params{ps}")
        for i in missing:
            print(f"simulation_{i:04d}")
    return np.array(all_data), np.array(all_params)


def refold_ert_vector(flat: np.ndarray, n_surveys: int = 14) -> np.ndarray:
    """(S*M,) flat sim output -> (M, S): surveys are contiguous blocks.

    Reference: ERT_Conditional_Diffusion.py:705-731.
    """
    flat = np.asarray(flat).squeeze()
    m = flat.shape[-1] // n_surveys if flat.ndim == 1 else None
    if flat.ndim != 1:
        raise ValueError(f"expected flat vector, got shape {flat.shape}")
    return flat.reshape(n_surveys, m).T


# --------------------------------------------------------------------------
# Dataset prep + splits + feed
# --------------------------------------------------------------------------

@dataclasses.dataclass
class ERTDataset:
    """Prepared diffusion dataset.

    params_u: (N, P) float32 — logit-unconstrained scaled parameters (x0).
    conditions: (N, L, C) float32 — min-max scaled ERT, feature-last.
    param_scaler / ert_scaler: fitted MinMax state (serialize with ckpts).
    """

    params_u: np.ndarray
    conditions: np.ndarray
    param_scaler: MinMaxScaler
    ert_scaler: MinMaxScaler
    a: float = 0.0
    b: float = 1.0

    def __len__(self) -> int:
        return self.params_u.shape[0]

    @property
    def param_dim(self) -> int:
        return self.params_u.shape[1]

    @property
    def cond_shape(self) -> Tuple[int, int]:
        return self.conditions.shape[1:]


def prepare_dataset(sim_param: np.ndarray, ert_sim: np.ndarray,
                    a: float = 0.0, b: float = 1.0,
                    param_scaler: Optional[MinMaxScaler] = None,
                    ert_scaler: Optional[MinMaxScaler] = None) -> ERTDataset:
    """Reference prep pipeline (ERT_Conditional_Diffusion.py:220-269).

    sim_param: (N, P, 1) or (N, P) physical-ish parameters.
    ert_sim:   (N, L, C) ERT measurement stacks (C surveys).
    Scalers may be passed in (e.g. restored from a checkpoint) instead of
    refit — the reproducibility fix over the reference.
    """
    sim_param = np.asarray(sim_param)
    ert_sim = np.asarray(ert_sim)
    if sim_param.ndim == 3 and sim_param.shape[2] == 1:
        raw = np.squeeze(sim_param, axis=2)
    else:
        raw = sim_param.copy()

    n = raw.shape[0]
    if ert_sim.shape[0] != n:
        # a divisible-but-wrong leading dim would silently fit scalers
        # on rows merging multiple simulations
        raise ValueError(f"sim_param has {n} simulations but ert_sim has "
                         f"{ert_sim.shape[0]}")
    if param_scaler is None:
        param_scaler = MinMaxScaler.fit(raw.reshape(n, -1), (a, b))
    scaled = param_scaler.transform(raw.reshape(n, -1)).reshape(raw.shape)
    params_u = transform_to_unconstrained(scaled, a, b).astype(np.float32)

    if ert_scaler is None:
        ert_scaler = MinMaxScaler.fit(ert_sim.reshape(n, -1), (0.0, 1.0))
    cond = ert_scaler.transform(ert_sim.reshape(n, -1)).reshape(ert_sim.shape)
    cond = cond.astype(np.float32)  # keep (N, L, C): feature-last for TPU

    return ERTDataset(params_u, cond, param_scaler, ert_scaler, a, b)


def split_dataset(n: int, seed: int = 42,
                  fractions: Tuple[float, float] = (0.8, 0.1)
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic 80/10/10 index split (reference uses torch
    random_split, ERT_Conditional_Diffusion.py:270-274; here a seeded
    permutation — statistically equivalent, bitwise-reproducible)."""
    train_size = int(fractions[0] * n)
    val_size = int(fractions[1] * n)
    perm = np.random.default_rng(seed).permutation(n)
    return (perm[:train_size], perm[train_size:train_size + val_size],
            perm[train_size + val_size:])


def batch_iterator(params_u: np.ndarray, conditions: np.ndarray,
                   batch_size: int, *, shuffle: bool, seed: int = 0,
                   epoch: int = 0, drop_remainder: bool = False,
                   sharding=None) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Host-side numpy batching -> device_put, optionally batch-sharded.

    With `sharding` (a jax.sharding.Sharding over the batch axis) each chip
    receives its slice directly — the TPU analogue of the reference's
    DataLoader feed (ERT_Conditional_Diffusion.py:278-280).
    """
    n = params_u.shape[0]
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(
            np.random.SeedSequence([seed, epoch])).permutation(n)
    stop = (n // batch_size) * batch_size if drop_remainder else n
    for s in range(0, stop, batch_size):
        idx = order[s:s + batch_size]
        x0 = params_u[idx]
        cond = conditions[idx]
        if sharding is not None and x0.shape[0] % _num_shards(sharding) == 0:
            yield (jax.device_put(x0, sharding),
                   jax.device_put(cond, sharding))
        else:
            yield jax.device_put(x0), jax.device_put(cond)


def _num_shards(sharding) -> int:
    """Shard count along the sharded (batch) axes of `sharding` — NOT
    the total device count: on a (data=4, model=2) mesh a P('data')
    batch sharding has 4 shards (each replicated over 'model')."""
    try:
        mesh_axes = dict(sharding.mesh.shape)
        used = [ax for axes in sharding.spec if axes is not None
                for ax in (axes if isinstance(axes, tuple) else (axes,))]
        return int(np.prod([mesh_axes[ax] for ax in used])) or 1
    except AttributeError:
        return 1


def pad_batch(x0: np.ndarray, cond: np.ndarray, batch_size: int
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-pad a ragged tail batch to `batch_size`; returns a weight mask.

    Keeps shapes static under jit (XLA recompiles per shape otherwise)."""
    b = x0.shape[0]
    if b == batch_size:
        return x0, cond, np.ones(batch_size, np.float32)
    pad = batch_size - b
    x0p = np.concatenate([x0, np.zeros((pad,) + x0.shape[1:], x0.dtype)])
    condp = np.concatenate(
        [cond, np.zeros((pad,) + cond.shape[1:], cond.dtype)])
    w = np.concatenate([np.ones(b, np.float32), np.zeros(pad, np.float32)])
    return x0p, condp, w
