"""Index mappings: bijections-with-relative-error between positive doubles and
int bucket indexes.

Semantics match the reference contract (``/root/reference/src/main/java/com/
datadoghq/sketch/ddsketch/mapping/IndexMapping.java:14-33,96-110`` and
``LogLikeIndexMapping.java:24-208``): ``index(v) = floor(log(v)*multiplier +
index_offset)`` where ``multiplier = ln(base)/ln(gamma)``, bucket lower bound
``lower_bound(i) = log_inverse((i - index_offset)/multiplier)``, representative
``value(i) = lower_bound(i) * (1 + relative_accuracy)``, and
``relative_accuracy = (gamma^cf - 1)/(gamma^cf + 1)`` with ``cf`` the
mapping-specific correcting factor.

The implementation is NumPy-vectorized from scratch: ``index`` / ``value`` /
``lower_bound`` accept arrays and are pure ufunc math (no per-element Python),
which is what lets the Spark layer compute bucket indexes for an entire Arrow
batch in one shot.

Two wire-identity fields determine merge compatibility, as in the reference
(``LogLikeIndexMapping.java:159-169``): ``(kind, gamma, index_offset)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "IndexMapping",
    "LogarithmicMapping",
    "LinearlyInterpolatedMapping",
    "QuadraticallyInterpolatedMapping",
    "CubicallyInterpolatedMapping",
    "QuarticallyInterpolatedMapping",
    "mapping_from_kind",
    "MAPPING_KINDS",
]

_INT32_MIN = -(2**31)
_INT32_MAX = 2**31 - 1
_MIN_NORMAL = 2.2250738585072014e-308  # smallest positive normal double
_MAX_DOUBLE = 1.7976931348623157e308

# IEEE-754 double bit layout (used by the interpolated mappings, mirroring
# DoubleBitOperationHelper.java:8-38 but vectorized over int64 views).
_SIGNIFICAND_MASK = np.int64(0x000FFFFFFFFFFFFF)
_EXPONENT_MASK = np.int64(0x7FF0000000000000)
_EXPONENT_SHIFT = np.int64(52)
_EXPONENT_BIAS = np.int64(1023)
_ONE_BITS = np.int64(0x3FF0000000000000)


def _pow_or_inf(base: float, exp: float) -> float:
    """math.pow with Java semantics: overflow -> +inf instead of raising."""
    try:
        return math.pow(base, exp)
    except OverflowError:
        return math.inf


def _java_floor(x: np.ndarray) -> np.ndarray:
    """Replicate the reference's fast floor (LogLikeIndexMapping.java:113-116):
    ``x >= 0 ? (int) x : (int) x - 1`` — truncation toward zero, minus one for
    negatives. Differs from true floor only at exact negative integers, where
    the reference (and therefore we) return ``floor(x) - 1``.
    """
    t = np.trunc(x)
    return np.where(x >= 0, t, t - 1.0).astype(np.int64)


def _exponent(bits: np.ndarray) -> np.ndarray:
    return ((bits & _EXPONENT_MASK) >> _EXPONENT_SHIFT) - _EXPONENT_BIAS


def _significand_plus_one(bits: np.ndarray) -> np.ndarray:
    return ((bits & _SIGNIFICAND_MASK) | _ONE_BITS).view(np.float64)


_TWO_MINUS_ULP = np.nextafter(2.0, 1.0)


def _build_double(exponent: np.ndarray, significand_plus_one: np.ndarray) -> np.ndarray:
    """2^exponent * significand_plus_one via bit assembly
    (DoubleBitOperationHelper.java:29-38). The contract requires
    significand_plus_one in [1, 2); polynomial-inverse rounding can land one
    ulp outside, which the bit masking would mis-scale by 2x, so clamp first.
    """
    sp1 = np.clip(np.asarray(significand_plus_one, np.float64), 1.0, _TWO_MINUS_ULP)
    exp_bits = ((exponent.astype(np.int64) + _EXPONENT_BIAS) << _EXPONENT_SHIFT) & _EXPONENT_MASK
    sig_bits = sp1.view(np.int64) & _SIGNIFICAND_MASK
    return (exp_bits | sig_bits).view(np.float64)


def _split(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """values -> (e, s) with value = 2^e * (1 + s), s in [0, 1)."""
    bits = np.asarray(values, np.float64).view(np.int64)
    return _exponent(bits).astype(np.float64), _significand_plus_one(bits) - 1.0


@dataclass(frozen=True)
class IndexMapping:
    """Base log-like mapping, parameterized by (gamma, index_offset).

    Subclasses supply ``_log`` (an approximation of log base ``_base``), its
    exact inverse ``_log_inverse``, and ``_correcting_factor``.
    """

    gamma: float
    index_offset: float = 0.0
    # derived, filled in __post_init__
    multiplier: float = field(init=False, repr=False, compare=False)
    relative_accuracy: float = field(init=False, repr=False, compare=False)

    kind: str = field(default="", init=False, repr=False, compare=False)

    def __post_init__(self) -> None:
        if not self.gamma > 1.0:
            raise ValueError("gamma must be greater than 1.")
        object.__setattr__(
            self, "multiplier", math.log(self._base()) / math.log1p(self.gamma - 1.0)
        )
        exact_log_gamma = math.pow(self.gamma, self._correcting_factor())
        object.__setattr__(
            self, "relative_accuracy", (exact_log_gamma - 1.0) / (exact_log_gamma + 1.0)
        )

    # -- construction ------------------------------------------------------
    @classmethod
    def from_relative_accuracy(cls, relative_accuracy: float) -> "IndexMapping":
        if not 0.0 < relative_accuracy < 1.0:
            raise ValueError("The relative accuracy must be between 0 and 1.")
        exact_log_gamma = (1.0 + relative_accuracy) / (1.0 - relative_accuracy)
        # a temporary instance only to query the class correcting factor
        gamma = math.pow(exact_log_gamma, 1.0 / cls._correcting_factor_static())
        return cls(gamma)

    # -- abstract pieces ---------------------------------------------------
    def _base(self) -> float:
        raise NotImplementedError

    @staticmethod
    def _correcting_factor_static() -> float:
        raise NotImplementedError

    def _correcting_factor(self) -> float:
        return self._correcting_factor_static()

    def _log(self, values: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _log_inverse(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    # -- public vectorized API --------------------------------------------
    def index(self, values) -> np.ndarray:
        """Bucket index of each (positive) value; int64 ndarray."""
        v = np.asarray(values, np.float64)
        return _java_floor(self._log(v) * self.multiplier + self.index_offset)

    def lower_bound(self, indexes) -> np.ndarray:
        i = np.asarray(indexes, np.float64)
        return self._log_inverse((i - self.index_offset) / self.multiplier)

    def upper_bound(self, indexes) -> np.ndarray:
        return self.lower_bound(np.asarray(indexes) + 1)

    def value(self, indexes) -> np.ndarray:
        """Representative value of each bucket: lower_bound * (1 + alpha)."""
        return self.lower_bound(indexes) * (1.0 + self.relative_accuracy)

    @property
    def min_indexable_value(self) -> float:
        return max(
            _pow_or_inf(self._base(), (_INT32_MIN - self.index_offset) / self.multiplier + 1),
            _MIN_NORMAL * (1.0 + self.relative_accuracy) / (1.0 - self.relative_accuracy),
        )

    @property
    def max_indexable_value(self) -> float:
        return min(
            _pow_or_inf(self._base(), (_INT32_MAX - self.index_offset) / self.multiplier - 1),
            _MAX_DOUBLE / (1.0 + self.relative_accuracy),
        )

    # -- identity ----------------------------------------------------------
    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.gamma == other.gamma
            and self.index_offset == other.index_offset
        )

    def __hash__(self) -> int:
        return hash((type(self).__name__, self.gamma, self.index_offset))


class LogarithmicMapping(IndexMapping):
    """Memory-optimal mapping: exact natural log (LogarithmicMapping.java:18-57)."""

    kind = "log"

    def _base(self) -> float:
        return math.e

    @staticmethod
    def _correcting_factor_static() -> float:
        return 1.0

    def _log(self, values: np.ndarray) -> np.ndarray:
        return np.log(values)

    def _log_inverse(self, x: np.ndarray) -> np.ndarray:
        return np.exp(x)


class LinearlyInterpolatedMapping(IndexMapping):
    """log2 approximated linearly between powers of 2
    (LinearlyInterpolatedMapping.java:17-75): log(v) = e + s for v = 2^e(1+s).

    Note: the reference's alpha-constructor uses a historical index-offset
    shift for back-compat; we construct from (gamma, index_offset) and expose
    the same shifted-offset alpha constructor.
    """

    kind = "lin"

    def _base(self) -> float:
        return 2.0

    @staticmethod
    def _correcting_factor_static() -> float:
        return 1.0 / math.log(2.0)

    @classmethod
    def from_relative_accuracy(cls, relative_accuracy: float) -> "LinearlyInterpolatedMapping":
        if not 0.0 < relative_accuracy < 1.0:
            raise ValueError("The relative accuracy must be between 0 and 1.")
        # Reference quirk (LinearlyInterpolatedMapping.java:21-40): the alpha
        # constructor applies a historical index-offset shift
        # 1/log1p(2a/(1-a)) (it does not map 1 to 0).
        exact_log_gamma = (1.0 + relative_accuracy) / (1.0 - relative_accuracy)
        gamma = math.pow(exact_log_gamma, 1.0 / cls._correcting_factor_static())
        index_offset = 1.0 / math.log1p(2.0 * relative_accuracy / (1.0 - relative_accuracy))
        return cls(gamma, index_offset)

    def _log(self, values: np.ndarray) -> np.ndarray:
        e, s = _split(values)
        return e + s

    def _log_inverse(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        exponent = np.floor(x)
        return _build_double(exponent, x - exponent + 1.0)


class QuadraticallyInterpolatedMapping(IndexMapping):
    """log2 approximated by a degree-2 polynomial of the significand
    (QuadraticallyInterpolatedMapping.java:18-66): log(v) = e - (s-5)(s-1)/3.
    """

    kind = "quad"

    def _base(self) -> float:
        return 2.0

    @staticmethod
    def _correcting_factor_static() -> float:
        return 3.0 / (4.0 * math.log(2.0))

    def _log(self, values: np.ndarray) -> np.ndarray:
        # Operates on significand-plus-one sp1 in [1, 2)
        # (QuadraticallyInterpolatedMapping.java:33-38).
        e, s = _split(values)
        sp1 = s + 1.0
        return e - (sp1 - 5.0) * (sp1 - 1.0) / 3.0

    def _log_inverse(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        exponent = np.floor(x)
        sp1 = 3.0 - np.sqrt(4.0 - 3.0 * (x - exponent))
        return _build_double(exponent, sp1)


class CubicallyInterpolatedMapping(IndexMapping):
    """log2 approximated by the optimal degree-3 polynomial
    (CubicallyInterpolatedMapping.java:74-133): log(v) = ((A s + B) s + C) s + e
    with A=6/35, B=-3/5, C=10/7; inverse via Cardano's formula. The default
    mapping of the reference's presets (DDSketches.java:75-78).
    """

    kind = "cubic"

    _A = 6.0 / 35.0
    _B = -3.0 / 5.0
    _C = 10.0 / 7.0

    def _base(self) -> float:
        return 2.0

    @staticmethod
    def _correcting_factor_static() -> float:
        return 1.0 / ((10.0 / 7.0) * math.log(2.0))

    def _log(self, values: np.ndarray) -> np.ndarray:
        e, s = _split(values)
        A, B, C = self._A, self._B, self._C
        return ((A * s + B) * s + C) * s + e

    def _log_inverse(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        exponent = np.floor(x)
        A, B, C = self._A, self._B, self._C
        d0 = B * B - 3.0 * A * C
        d1 = 2.0 * B**3 - 9.0 * A * B * C - 27.0 * A * A * (x - exponent)
        p = np.cbrt((d1 - np.sqrt(d1 * d1 - 4.0 * d0**3)) / 2.0)
        significand_plus_one = -(B + p + d0 / p) / (3.0 * A) + 1.0
        return _build_double(exponent, significand_plus_one)


class QuarticallyInterpolatedMapping(IndexMapping):
    """log2 approximated by the optimal degree-4 polynomial
    (QuarticallyInterpolatedMapping.java:18-85); inverse via Ferrari's method.
    """

    kind = "quartic"

    _A = -2.0 / 25.0
    _B = 8.0 / 25.0
    _C = -17.0 / 25.0
    _D = 36.0 / 25.0

    def _base(self) -> float:
        return 2.0

    @staticmethod
    def _correcting_factor_static() -> float:
        return 1.0 / ((36.0 / 25.0) * math.log(2.0))

    def _log(self, values: np.ndarray) -> np.ndarray:
        e, s = _split(values)
        A, B, C, D = self._A, self._B, self._C, self._D
        return (((A * s + B) * s + C) * s + D) * s + e

    def _log_inverse(self, x: np.ndarray) -> np.ndarray:
        # Ferrari's method on the depressed quartic, following the exact
        # sequence of operations in QuarticallyInterpolatedMapping.java:45-64
        # so bucket boundaries agree with the reference.
        x = np.asarray(x, np.float64)
        exponent = np.floor(x)
        e = exponent - x
        A, B, C, D = self._A, self._B, self._C, self._D
        alpha = -(3.0 * B * B) / (8.0 * A * A) + C / A
        beta = (B**3) / (8.0 * A**3) - (B * C) / (2.0 * A * A) + D / A
        gamma_ = (
            -(3.0 * B**4) / (256.0 * A**4)
            + (C * B * B) / (16.0 * A**3)
            - (B * D) / (4.0 * A * A)
            + e / A
        )
        p = -(alpha * alpha) / 12.0 - gamma_
        q = -(alpha**3) / 108.0 + (alpha * gamma_) / 3.0 - (beta * beta) / 8.0
        r = -q / 2.0 + np.sqrt((q * q) / 4.0 + (p**3) / 27.0)
        u = np.cbrt(r)
        y = -(5.0 * alpha) / 6.0 + u - p / (3.0 * u)
        w = np.sqrt(alpha + 2.0 * y)
        root = -B / (4.0 * A) + (
            w - np.sqrt(np.maximum(-(3.0 * alpha + 2.0 * y + (2.0 * beta) / w), 0.0))
        ) / 2.0
        return _build_double(exponent, root + 1.0)


MAPPING_KINDS: dict[str, type[IndexMapping]] = {
    cls.kind: cls
    for cls in (
        LogarithmicMapping,
        LinearlyInterpolatedMapping,
        QuadraticallyInterpolatedMapping,
        CubicallyInterpolatedMapping,
        QuarticallyInterpolatedMapping,
    )
}


def mapping_from_kind(kind: str, gamma: float, index_offset: float = 0.0) -> IndexMapping:
    try:
        cls = MAPPING_KINDS[kind]
    except KeyError:
        raise ValueError(f"unknown mapping kind {kind!r}; one of {sorted(MAPPING_KINDS)}")
    return cls(gamma, index_offset)


class BitwiseLinearlyInterpolatedMapping:
    """Pure-bit-ops mapping (BitwiseLinearlyInterpolatedMapping.java:27-148):
    ``index = (exponent << k) | top-k significand bits`` — only power-of-2
    gamma; actual relative accuracy ``1 - 2/(1 + exp(2^-k))``. Its only
    advantage over the polynomial mappings is scalar-CPU cost (moot under
    NumPy), but it is implemented for full mapping-surface parity. Like the
    reference, it serializes as the LOG_LINEAR layout and degrades to
    LinearlyInterpolatedMapping on wire round-trip.
    """

    kind = "bitwise"

    def __init__(self, gamma: float, index_offset: float = 0.0):
        # recover k from gamma = 2^(2^-k); index_offset must be 0
        multiplier = int(round(1.0 / math.log2(gamma)))
        if (
            multiplier < 1
            or (multiplier & (multiplier - 1))
            or not math.isclose(gamma, 2.0 ** (1.0 / multiplier), rel_tol=1e-12)
        ):
            raise ValueError("bitwise mapping requires gamma = 2^(1/2^k)")
        if index_offset != 0.0:
            raise ValueError("bitwise mapping has no index offset")
        self._init_from_bits(multiplier.bit_length() - 1)

    def _init_from_bits(self, num_significant_binary_digits: int) -> None:
        if num_significant_binary_digits < 0:
            raise ValueError("The number of significant binary digits cannot be negative.")
        self.num_significant_binary_digits = num_significant_binary_digits
        self._partial_significand_shift = 53 - num_significant_binary_digits - 1
        self.multiplier = 1 << num_significant_binary_digits
        self.relative_accuracy = 1.0 - 2.0 / (1.0 + math.exp(1.0 / self.multiplier))
        self.gamma = math.pow(2.0, 1.0 / self.multiplier)
        self.index_offset = 0.0

    @classmethod
    def from_significant_bits(cls, k: int) -> "BitwiseLinearlyInterpolatedMapping":
        self = cls.__new__(cls)
        self._init_from_bits(k)
        return self

    @classmethod
    def from_relative_accuracy(cls, relative_accuracy: float) -> "BitwiseLinearlyInterpolatedMapping":
        if not 0.0 < relative_accuracy < 1.0:
            raise ValueError("The relative accuracy must be between 0 and 1.")
        multiplier = 1.0 / math.log1p(2.0 * relative_accuracy / (1.0 - relative_accuracy))
        k = max(math.ceil(math.log(multiplier) / math.log(2.0)), 0)
        return cls.from_significant_bits(k)

    def index(self, values) -> np.ndarray:
        bits = np.asarray(values, np.float64).view(np.int64)
        exponent = _exponent(bits)
        partial = (bits & _SIGNIFICAND_MASK) >> np.int64(self._partial_significand_shift)
        return (exponent << np.int64(self.num_significant_binary_digits)) | partial

    def lower_bound(self, indexes) -> np.ndarray:
        i = np.asarray(indexes, np.int64)
        exponent = np.floor_divide(i, self.multiplier)
        sp1 = 1.0 - exponent + i.astype(np.float64) / self.multiplier
        return _build_double(exponent, sp1)

    def upper_bound(self, indexes) -> np.ndarray:
        return self.lower_bound(np.asarray(indexes) + 1)

    def value(self, indexes) -> np.ndarray:
        return self.lower_bound(indexes) * (1.0 + self.relative_accuracy)

    @property
    def min_indexable_value(self) -> float:
        return max(
            _pow_or_inf(2.0, _INT32_MIN / self.multiplier + 1),
            _MIN_NORMAL * (1.0 + self.relative_accuracy) / (1.0 - self.relative_accuracy),
        )

    @property
    def max_indexable_value(self) -> float:
        return min(
            _pow_or_inf(2.0, _INT32_MAX / self.multiplier),
            _MAX_DOUBLE / (1.0 + self.relative_accuracy),
        )

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.num_significant_binary_digits == other.num_significant_binary_digits
        )

    def __hash__(self) -> int:
        return hash(("bitwise", self.num_significant_binary_digits))


MAPPING_KINDS["bitwise"] = BitwiseLinearlyInterpolatedMapping
__all__.append("BitwiseLinearlyInterpolatedMapping")
