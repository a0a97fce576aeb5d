"""Sketch configuration presets, mirroring the reference's factory surface
(``/root/reference/src/main/java/com/datadoghq/sketch/ddsketch/DDSketches.java:
66-171``): a (mapping kind x store policy) matrix keyed by relative accuracy.

``SketchConfig`` is the value threaded through the Spark UDAF layer: it is
picklable, cheap to ship to executors, and two sketches are mergeable iff
their configs produce equal mappings (``DDSketch.java:268-281``).
"""

from __future__ import annotations

from dataclasses import dataclass

from .mapping import IndexMapping, MAPPING_KINDS, mapping_from_kind
from .sketch import DDSketch

__all__ = [
    "SketchConfig",
    "unbounded_dense",
    "collapsing_lowest_dense",
    "collapsing_highest_dense",
    "sparse",
    "logarithmic_unbounded_dense",
    "logarithmic_collapsing_lowest_dense",
    "logarithmic_collapsing_highest_dense",
]

DEFAULT_RELATIVE_ACCURACY = 0.01
DEFAULT_MAX_BINS = 2048


@dataclass(frozen=True)
class SketchConfig:
    """Fully determines a sketch: mapping identity + store behavior."""

    mapping_kind: str = "cubic"
    gamma: float = 0.0  # 0.0 -> derive from relative_accuracy
    index_offset: float = 0.0
    relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY
    store_policy: str = "collapsing_lowest"
    max_bins: int = DEFAULT_MAX_BINS
    track_exact_stats: bool = True

    def mapping(self) -> IndexMapping:
        if self.gamma > 0.0:
            return mapping_from_kind(self.mapping_kind, self.gamma, self.index_offset)
        return MAPPING_KINDS[self.mapping_kind].from_relative_accuracy(self.relative_accuracy)

    def new_sketch(self) -> DDSketch:
        return DDSketch(
            mapping=self.mapping(),
            store_policy=self.store_policy,
            max_bins=self.max_bins,
            track_exact_stats=self.track_exact_stats,
        )

    @property
    def alpha(self) -> float:
        return self.mapping().relative_accuracy


def unbounded_dense(relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY) -> SketchConfig:
    """DDSketches.unboundedDense (DDSketches.java:75-78): cubic + unbounded."""
    return SketchConfig("cubic", relative_accuracy=relative_accuracy, store_policy="unbounded", max_bins=0)


def collapsing_lowest_dense(
    relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY, max_bins: int = DEFAULT_MAX_BINS
) -> SketchConfig:
    """DDSketches.collapsingLowestDense (DDSketches.java:89-93)."""
    return SketchConfig(
        "cubic", relative_accuracy=relative_accuracy, store_policy="collapsing_lowest", max_bins=max_bins
    )


def collapsing_highest_dense(
    relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY, max_bins: int = DEFAULT_MAX_BINS
) -> SketchConfig:
    """DDSketches.collapsingHighestDense (DDSketches.java:104-108)."""
    return SketchConfig(
        "cubic", relative_accuracy=relative_accuracy, store_policy="collapsing_highest", max_bins=max_bins
    )


def sparse(relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY) -> SketchConfig:
    """DDSketches.sparse (DDSketches.java:120-122): cubic + sparse store."""
    return SketchConfig("cubic", relative_accuracy=relative_accuracy, store_policy="sparse", max_bins=0)


def logarithmic_unbounded_dense(
    relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY,
) -> SketchConfig:
    """DDSketches.logarithmicUnboundedDense (DDSketches.java:134-136)."""
    return SketchConfig("log", relative_accuracy=relative_accuracy, store_policy="unbounded", max_bins=0)


def logarithmic_collapsing_lowest_dense(
    relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY, max_bins: int = DEFAULT_MAX_BINS
) -> SketchConfig:
    """DDSketches.logarithmicCollapsingLowestDense (DDSketches.java:150-153) —
    'the version described in the DDSketch paper' (README.md:43)."""
    return SketchConfig(
        "log", relative_accuracy=relative_accuracy, store_policy="collapsing_lowest", max_bins=max_bins
    )


def logarithmic_collapsing_highest_dense(
    relative_accuracy: float = DEFAULT_RELATIVE_ACCURACY, max_bins: int = DEFAULT_MAX_BINS
) -> SketchConfig:
    """DDSketches.logarithmicCollapsingHighestDense (DDSketches.java:167-171)."""
    return SketchConfig(
        "log", relative_accuracy=relative_accuracy, store_policy="collapsing_highest", max_bins=max_bins
    )
