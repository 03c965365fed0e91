"""Selfplay-data shuffler — equivalent of python/shuffle.py.

The reference performs a two-phase disk shuffle of selfplay npz shards into
fixed-size training shards, serving a growing window of recent data (taper
window exponent, shuffle.py:199,406-436). This implementation covers the
same contract at the scales this framework currently runs: choose the data
window over row count, globally permute rows across files, and emit
fixed-size output shards.
"""

from __future__ import annotations

import os

import numpy as np


def compute_window_size(total_rows: int, *, min_rows: int = 250_000,
                        keep_prop: float = 1.0,
                        taper_exponent: float = 0.675,
                        scale: float = 4.0) -> int:
    """Growing data window per the reference's formula family: starts at
    min_rows and grows sublinearly (exponent) with total data generated."""
    if total_rows <= min_rows:
        return int(total_rows * keep_prop)
    extra = (total_rows / min_rows) ** taper_exponent
    window = min_rows * (1.0 + (extra - 1.0) * scale / taper_exponent / 4.0)
    return int(min(total_rows, window * keep_prop))


def shuffle_npz_files(in_files: list[str], out_dir: str, *,
                      rows_per_shard: int = 32768,
                      window_rows: int | None = None,
                      seed: int = 0) -> list[str]:
    """Shuffle rows of the given npz shards into new shards in out_dir.

    Files are ordered oldest-first; the window keeps the newest rows.
    Returns the list of written shard paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    arrays: dict[str, list[np.ndarray]] = {}
    total = 0
    for path in in_files:
        with np.load(path) as z:
            n = z[list(z.keys())[0]].shape[0]
            total += n
            for k in z.keys():
                arrays.setdefault(k, []).append(z[k])
    if total == 0:
        return []
    merged = {k: np.concatenate(v, axis=0) for k, v in arrays.items()}

    if window_rows is None:
        window_rows = compute_window_size(total)
    start = max(0, total - window_rows)
    merged = {k: v[start:] for k, v in merged.items()}
    n = total - start

    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    merged = {k: v[perm] for k, v in merged.items()}

    out_paths = []
    for i in range(0, n, rows_per_shard):
        shard = {k: v[i:i + rows_per_shard] for k, v in merged.items()}
        path = os.path.join(out_dir, f"data{len(out_paths):06d}.npz")
        np.savez_compressed(path, **shard)
        out_paths.append(path)
    return out_paths
