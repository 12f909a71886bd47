# Empirical-CDF <-> Gaussian mapping for the HSV colour sliders.
#
# The reference bisects a sorted per-dimension HSV table with scipy on the
# host per slider move (ref: util/color_from_hsv_to_gaussian.py:16-33).
# Here the table is a static array and both directions are jnp.searchsorted /
# gather — fully jittable, vmappable over batches of edits.

from __future__ import annotations

import os
import pickle

import jax.scipy.stats as jstats
import jax.numpy as jnp
import numpy as np

_SQRT2 = float(np.sqrt(2.0))


def _default_table(n: int = 4096) -> np.ndarray:
    """Fallback HSV statistics table when no dataset table is available.

    Column-wise sorted quantile tables for (H, S, V): a broad smooth prior
    over observed hair colours; replace with the dataset-derived table
    (hsv_stat_dict_ordered.pkl analogue) for exact reference behaviour.
    """
    q = (np.arange(n) + 0.5) / n
    # Hair hues cluster in the red-orange band with a long tail; saturation
    # and value roughly beta-distributed.
    h = 179.0 * q ** 2.2 * 0.35
    s = 255.0 * q ** 0.9
    v = 255.0 * (0.05 + 0.9 * q)
    return np.stack([h, s, v], axis=1).astype(np.float32)


class DistTranslation:
    """gaussian latent <-> raw HSV value translation."""

    def __init__(self, table: np.ndarray | None = None,
                 table_path: str | None = None):
        if table is None and table_path and os.path.exists(table_path):
            with open(table_path, 'rb') as f:
                table = pickle.load(f)
        if table is None:
            table = _default_table()
        # ensure each column is sorted (column-wise quantile table)
        self.table = jnp.asarray(np.sort(np.asarray(table, np.float32), axis=0))
        self.n = self.table.shape[0]

    def gaussian_to_val(self, dim: int, val) -> jnp.ndarray:
        """Φ(val)-quantile lookup (ref: color_from_hsv_to_gaussian.py:22-25)."""
        idx = jnp.clip(
            (jstats.norm.cdf(jnp.asarray(val, jnp.float32)) * self.n)
            .astype(jnp.int32), 0, self.n - 1)
        return self.table[idx, dim]

    def val_to_gaussian(self, dim: int, val) -> jnp.ndarray:
        """Inverse: mid-rank -> Φ⁻¹ (ref: color_from_hsv_to_gaussian.py:27-33)."""
        col = self.table[:, dim]
        val = jnp.asarray(val, jnp.float32)
        left = jnp.searchsorted(col, val, side='left')
        right = jnp.searchsorted(col, val, side='right')
        p = (left + right).astype(jnp.float32) / (2.0 * self.n)
        p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
        return jnp.asarray(jstats.norm.ppf(p), jnp.float32)
