"""Non-text grounding locations (grounded.rs Location variants).

Reference: ``Location`` (/root/reference/anno-core/src/grounded.rs:162-226)
with variants Text, BoundingBox (normalized [0,1] rect + optional page),
Temporal (seconds + optional frame), Cuboid (center/dimensions/quaternion),
Genomic (contig + 0-based half-open interval + strand), Discontinuous
(segment list, entity.rs:1187-1301: segments sorted by start on
construction), and TextWithBbox (OCR hybrid). Overlap and IoU follow
grounded.rs:277-364 exactly:

- ``overlaps``: Text vs Text interval test; BBox vs BBox same-page rect
  test; every cross-kind pair is False.
- ``iou``: Text -> intersection over SPAN union (max(e)-min(s)); BBox ->
  area IoU with same-page gate (different pages -> 0.0); all other kinds
  -> None.

Column encoding: one flat nullable Arrow struct per location (``ARROW_TYPE``)
so a Dataset can carry mixed grounding kinds in a single column and
kernels stay vectorizable; ``locations_table`` / ``from_row`` round-trip,
``validate_table`` enforces the per-kind invariants.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

KINDS = (
    "text", "bbox", "temporal", "cuboid", "genomic", "discontinuous",
    "text_bbox",
)

ARROW_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("x", pa.float32()),
        ("y", pa.float32()),
        ("width", pa.float32()),
        ("height", pa.float32()),
        ("page", pa.int32()),
        ("start_sec", pa.float64()),
        ("end_sec", pa.float64()),
        ("frame", pa.int64()),
        ("center", pa.list_(pa.float32(), 3)),
        ("dimensions", pa.list_(pa.float32(), 3)),
        ("rotation", pa.list_(pa.float32(), 4)),
        ("contig", pa.string()),
        ("strand", pa.string()),
        ("segments", pa.list_(pa.list_(pa.int64(), 2))),
        ("bbox", pa.list_(pa.float32(), 4)),  # TextWithBbox inner rect
    ]
)


@dataclass
class Location:
    kind: str
    fields: dict = field(default_factory=dict)

    # --- constructors (grounded.rs:229-276) ---------------------------------
    @classmethod
    def text(cls, start: int, end: int) -> "Location":
        return cls("text", {"start": start, "end": end})

    @classmethod
    def bounding_box(
        cls, x: float, y: float, width: float, height: float, page: int | None = None
    ) -> "Location":
        return cls(
            "bbox", {"x": x, "y": y, "width": width, "height": height, "page": page}
        )

    @classmethod
    def temporal(
        cls, start_sec: float, end_sec: float, frame: int | None = None
    ) -> "Location":
        return cls(
            "temporal", {"start_sec": start_sec, "end_sec": end_sec, "frame": frame}
        )

    @classmethod
    def cuboid(cls, center, dimensions, rotation=(1.0, 0.0, 0.0, 0.0)) -> "Location":
        return cls(
            "cuboid",
            {
                "center": list(center),
                "dimensions": list(dimensions),
                "rotation": list(rotation),
            },
        )

    @classmethod
    def genomic(
        cls, contig: str, start: int, end: int, strand: str | None = None
    ) -> "Location":
        return cls(
            "genomic", {"contig": contig, "start": start, "end": end, "strand": strand}
        )

    @classmethod
    def discontinuous(cls, segments) -> "Location":
        # entity.rs:1196-1199: segments sorted by start on construction
        segs = sorted((int(s), int(e)) for s, e in segments)
        return cls("discontinuous", {"segments": segs})

    @classmethod
    def text_with_bbox(cls, start: int, end: int, bbox: "Location") -> "Location":
        assert bbox.kind == "bbox"
        f = bbox.fields
        return cls(
            "text_bbox",
            {
                "start": start,
                "end": end,
                "bbox": [f["x"], f["y"], f["width"], f["height"]],
                "page": f.get("page"),
            },
        )

    # --- derived (entity.rs:1227-1301) ---------------------------------------
    def bounding_range(self) -> tuple[int, int] | None:
        if self.kind == "text" or self.kind == "text_bbox":
            return (self.fields["start"], self.fields["end"])
        if self.kind == "discontinuous" and self.fields["segments"]:
            segs = self.fields["segments"]
            return (segs[0][0], max(e for _, e in segs))
        return None

    def total_len(self) -> int:
        if self.kind == "discontinuous":
            return sum(e - s for s, e in self.fields["segments"])
        r = self.bounding_range()
        return (r[1] - r[0]) if r else 0

    def contains(self, pos: int) -> bool:
        if self.kind == "discontinuous":
            return any(s <= pos < e for s, e in self.fields["segments"])
        r = self.bounding_range()
        return bool(r and r[0] <= pos < r[1])

    def extract_text(self, text: str, separator: str = " ") -> str:
        if self.kind == "discontinuous":
            return separator.join(
                text[s:e] for s, e in self.fields["segments"]
            )
        r = self.bounding_range()
        return text[r[0]:r[1]] if r else ""

    # --- reference-exact overlap/iou (grounded.rs:277-364) -------------------
    def overlaps(self, other: "Location") -> bool:
        if self.kind == "text" and other.kind == "text":
            a, b = self.fields, other.fields
            return a["start"] < b["end"] and b["start"] < a["end"]
        if self.kind == "bbox" and other.kind == "bbox":
            a, b = self.fields, other.fields
            if a.get("page") != b.get("page"):
                return False
            return (
                a["x"] < b["x"] + b["width"]
                and a["x"] + a["width"] > b["x"]
                and a["y"] < b["y"] + b["height"]
                and a["y"] + a["height"] > b["y"]
            )
        return False  # different kinds never overlap (grounded.rs:303)

    def iou(self, other: "Location") -> float | None:
        if self.kind == "text" and other.kind == "text":
            a, b = self.fields, other.fields
            i0, i1 = max(a["start"], b["start"]), min(a["end"], b["end"])
            if i0 >= i1:
                return 0.0
            union = max(a["end"], b["end"]) - min(a["start"], b["start"])
            return (i1 - i0) / union if union else 0.0
        if self.kind == "bbox" and other.kind == "bbox":
            a, b = self.fields, other.fields
            if a.get("page") != b.get("page"):
                return 0.0
            xo = min(a["x"] + a["width"], b["x"] + b["width"]) - max(a["x"], b["x"])
            yo = min(a["y"] + a["height"], b["y"] + b["height"]) - max(a["y"], b["y"])
            if xo <= 0.0 or yo <= 0.0:
                return 0.0
            inter = float(xo * yo)
            union = float(a["width"] * a["height"]) + float(
                b["width"] * b["height"]
            ) - inter
            return inter / union if union else 0.0
        return None  # grounded.rs:364: only text/bbox have IoU

    # --- Arrow round-trip -----------------------------------------------------
    def to_row(self) -> dict:
        row = {f.name: None for f in ARROW_TYPE}
        row["kind"] = self.kind
        for k, v in self.fields.items():
            if k == "segments":
                row["segments"] = [list(p) for p in v]
            else:
                row[k] = v
        return row

    @classmethod
    def from_row(cls, row: dict) -> "Location":
        kind = row["kind"]
        keep = {
            "text": ("start", "end"),
            "bbox": ("x", "y", "width", "height", "page"),
            "temporal": ("start_sec", "end_sec", "frame"),
            "cuboid": ("center", "dimensions", "rotation"),
            "genomic": ("contig", "start", "end", "strand"),
            "discontinuous": ("segments",),
            "text_bbox": ("start", "end", "bbox", "page"),
        }[kind]
        f = {k: row.get(k) for k in keep}
        if kind == "discontinuous":
            f["segments"] = [tuple(p) for p in (f["segments"] or [])]
        return cls(kind, f)


def locations_table(locs: list[Location]) -> pa.Table:
    return pa.table({"location": pa.array([l.to_row() for l in locs], ARROW_TYPE)})


def validate_table(tbl: pa.Table, col: str = "location") -> list[str]:
    """Per-kind invariant check over an Arrow location column; returns error
    strings (empty = valid). Invariants: known kind; text/genomic start<=end
    and >=0; bbox fields present with width/height >= 0; temporal
    start_sec <= end_sec; cuboid vectors sized 3/3/4; discontinuous segments
    sorted by start with s<=e."""
    errs: list[str] = []
    for i, row in enumerate(tbl.column(col).to_pylist()):
        kind = row.get("kind")
        if kind not in KINDS:
            errs.append(f"row {i}: unknown kind {kind!r}")
            continue
        if kind in ("text", "genomic", "text_bbox"):
            s, e = row.get("start"), row.get("end")
            if s is None or e is None or s < 0 or e < s:
                errs.append(f"row {i}: bad interval [{s}, {e})")
        if kind == "bbox" or kind == "text_bbox":
            if kind == "bbox":
                vals = [row.get(k) for k in ("x", "y", "width", "height")]
            else:
                vals = row.get("bbox")
            if vals is None or any(v is None for v in vals):
                errs.append(f"row {i}: missing bbox fields")
            elif vals[2] < 0 or vals[3] < 0:
                errs.append(f"row {i}: negative bbox size")
        if kind == "temporal":
            s, e = row.get("start_sec"), row.get("end_sec")
            if s is None or e is None or e < s:
                errs.append(f"row {i}: bad temporal interval [{s}, {e}]")
        if kind == "cuboid":
            for name, n in (("center", 3), ("dimensions", 3), ("rotation", 4)):
                v = row.get(name)
                if v is None or len(v) != n:
                    errs.append(f"row {i}: {name} must have {n} elements")
        if kind == "genomic" and not row.get("contig"):
            errs.append(f"row {i}: genomic contig missing")
        if kind == "discontinuous":
            segs = row.get("segments") or []
            starts = [s for s, _ in segs]
            if starts != sorted(starts) or any(e < s for s, e in segs):
                errs.append(f"row {i}: segments must be start-sorted with s<=e")
    return errs


def pairwise_iou(tbl_a: pa.Table, tbl_b: pa.Table, col: str = "location"):
    """Row-aligned IoU between two location columns (None where undefined —
    the cross-kind / non-geometric cases, matching grounded.rs)."""
    a = [Location.from_row(r) for r in tbl_a.column(col).to_pylist()]
    b = [Location.from_row(r) for r in tbl_b.column(col).to_pylist()]
    return pa.table(
        {"iou": pa.array([x.iou(y) for x, y in zip(a, b)], pa.float64())}
    )
