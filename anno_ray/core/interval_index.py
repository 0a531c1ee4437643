"""Per-document interval index for span range queries (J3).

Reimplements the query surface of ``TextSpatialIndex``
(/root/reference/anno-core/src/grounded.rs:1861-2099): overlap, containing,
contained_in lookups over text spans. Sorted-array + bisect instead of an
interval tree — same O(log n + k) queries, doc-local use inside batch
kernels (argument attachment etc.), never a distributed op.
"""

from __future__ import annotations

import bisect


class IntervalIndex:
    def __init__(self, spans: list[tuple[int, int]]):
        """spans: (start, end) per item; item ids are list indexes."""
        self.spans = list(spans)
        self._by_start = sorted(range(len(spans)), key=lambda i: (spans[i][0], spans[i][1]))
        self._starts = [spans[i][0] for i in self._by_start]
        self.max_len = max((e - s for s, e in spans), default=0)

    def overlapping(self, start: int, end: int) -> list[int]:
        """Item ids whose span overlaps [start, end) (half-open)."""
        out = []
        # any span with start < end and end > start; candidate starts are in
        # [start - max_len, end)
        lo = bisect.bisect_left(self._starts, start - self.max_len)
        hi = bisect.bisect_left(self._starts, end)
        for k in range(lo, hi):
            i = self._by_start[k]
            s, e = self.spans[i]
            if e > start and s < end:
                out.append(i)
        return sorted(out)

    def containing(self, pos: int) -> list[int]:
        """Item ids whose span contains position pos."""
        return [i for i in self.overlapping(pos, pos + 1) if self.spans[i][0] <= pos < self.spans[i][1]]

    def contained_in(self, start: int, end: int) -> list[int]:
        """Item ids fully inside [start, end)."""
        return [
            i
            for i in self.overlapping(start, end)
            if self.spans[i][0] >= start and self.spans[i][1] <= end
        ]


def span_overlaps(a: tuple[int, int], b: tuple[int, int]) -> bool:
    """Location::overlaps for text spans (grounded.rs:277-307)."""
    return a[1] > b[0] and a[0] < b[1]


def span_iou(a: tuple[int, int], b: tuple[int, int]) -> float:
    """Location::iou for text spans (grounded.rs:313-365)."""
    inter = max(0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union if union > 0 else 0.0


def span_distance(a: tuple[int, int], b: tuple[int, int]) -> int:
    """Gap between non-overlapping spans, 0 when overlapping
    (entity.rs:2843-2851)."""
    if span_overlaps(a, b):
        return 0
    if b[0] >= a[1]:
        return b[0] - a[1]
    return a[0] - b[1]
