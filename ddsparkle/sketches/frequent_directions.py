"""Frequent Directions — a deterministic mergeable MATRIX sketch
(Liberty, KDD 2013; Ghashami/Liberty/Phillips/Woodruff 2015): maintains
an ``l x d`` matrix ``B`` such that for the input row-matrix ``A``

    0  <=  A'A - B'B   (PSD)          and
    ||A'A - B'B||_2  <=  2 ||A||_F^2 / l

and the guarantee survives arbitrary merge trees (stack two sketches,
shrink once), which is exactly the shape a Spark tree-reduce needs. This
is the covariance/PCA counterpart of the scalar sketches in this package
(HLL for distinct, KLL/DDSketch for quantiles, CMS for frequency): one
pass, bounded memory, mergeable — here over the ``embeddings`` table for
training-data analysis (dominant directions, second-moment screening).

No counterpart exists in the reference (DataDog/sketches-java is a
scalar-quantile library); this is brief-driven scope ("similarity /
embedding analysis a large-scale training pipeline needs"). The
implementation is original NumPy (buffer of ``2l`` rows, one SVD per
shrink, shrink by the ``(l+1)``-th squared singular value).

Determinism contract: the sketch is deterministic for a FIXED row order,
but a distributed build's merge order depends on partitioning — so
downstream gates must only expose partitioning-INVARIANT outputs (exact
integer second moments, theorem-guaranteed bound booleans), the
``set_overlap``/LSH-recall gate discipline.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FrequentDirections"]


class FrequentDirections:
    """Streaming FD sketch with ``l`` retained rows and a ``2l`` buffer.

    ``insert(rows)`` appends a batch; ``shrink`` runs when the buffer
    fills. ``merge(other)`` stacks the two retained matrices and shrinks
    once — associative in the bound (any merge tree keeps the guarantee).
    """

    def __init__(self, l: int, d: int):
        if l < 1 or d < 1:
            raise ValueError("l >= 1 and d >= 1 required")
        self.l = int(l)
        self.d = int(d)
        self._buf = np.zeros((2 * self.l, self.d), dtype=np.float64)
        self._n = 0  # filled rows in _buf

    # -- core ---------------------------------------------------------

    def insert(self, rows: np.ndarray) -> "FrequentDirections":
        rows = np.atleast_2d(np.asarray(rows, dtype=np.float64))
        if rows.shape[1] != self.d:
            raise ValueError(f"expected {self.d} columns, got {rows.shape[1]}")
        i = 0
        while i < len(rows):
            take = min(2 * self.l - self._n, len(rows) - i)
            self._buf[self._n : self._n + take] = rows[i : i + take]
            self._n += take
            i += take
            if self._n == 2 * self.l:
                self._shrink()
        return self

    def _shrink(self) -> None:
        # SVD of the (possibly partially filled) buffer; keep the top-l
        # directions with singular values shrunk by delta = s_{l+1}^2.
        _, s, vt = np.linalg.svd(self._buf[: self._n], full_matrices=False)
        if len(s) > self.l:
            delta = s[self.l] ** 2
            s2 = np.maximum(s[: self.l] ** 2 - delta, 0.0)
        else:
            s2 = s**2
        k = min(self.l, len(s))
        self._buf[:] = 0.0
        self._buf[:k] = np.sqrt(s2[:k])[:, None] * vt[:k]
        self._n = k

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if other.d != self.d or other.l != self.l:
            raise ValueError("merge requires identical (l, d)")
        self.insert(other.sketch())
        return self

    # -- views ----------------------------------------------------------

    def sketch(self) -> np.ndarray:
        """The retained rows (<= 2l before a final shrink; call
        ``compact()`` first for the canonical l-row form)."""
        return self._buf[: self._n].copy()

    def compact(self) -> np.ndarray:
        """Shrink to <= l rows and return B (l x d, zero-padded)."""
        if self._n > self.l:
            self._shrink()
        out = np.zeros((self.l, self.d), dtype=np.float64)
        out[: self._n] = self._buf[: self._n]
        return out

    def cov(self) -> np.ndarray:
        """B'B — the sketched (uncentered) second-moment matrix."""
        b = self.compact()
        return b.T @ b
