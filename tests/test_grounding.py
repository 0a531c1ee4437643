"""Non-text Location variants (core/grounding.py vs grounded.rs:162-364 and
entity.rs:1187-1301): reference-exact overlap/IoU semantics, Arrow struct
round-trip, per-kind validation."""

from __future__ import annotations

import pytest

from anno_ray.core.grounding import (
    ARROW_TYPE,
    Location,
    locations_table,
    pairwise_iou,
    validate_table,
)


def test_text_overlap_and_iou():
    a, b = Location.text(0, 10), Location.text(5, 15)
    assert a.overlaps(b) and b.overlaps(a)
    # grounded.rs iou: intersection 5 / span-union (15-0)
    assert a.iou(b) == pytest.approx(5 / 15)
    assert Location.text(0, 5).overlaps(Location.text(5, 10)) is False
    assert Location.text(0, 5).iou(Location.text(5, 10)) == 0.0
    assert Location.text(0, 0).iou(Location.text(0, 0)) == 0.0


def test_bbox_overlap_page_gate_and_iou():
    a = Location.bounding_box(0.0, 0.0, 0.5, 0.5)
    b = Location.bounding_box(0.25, 0.25, 0.5, 0.5)
    assert a.overlaps(b)
    inter = 0.25 * 0.25
    union = 0.25 + 0.25 - inter
    assert a.iou(b) == pytest.approx(inter / union, rel=1e-6)
    # different pages: no overlap, IoU 0.0 (grounded.rs page gate)
    c = Location.bounding_box(0.0, 0.0, 0.5, 0.5, page=2)
    assert not a.overlaps(c)
    assert a.iou(c) == 0.0
    # disjoint rects
    d = Location.bounding_box(0.9, 0.9, 0.05, 0.05)
    assert not a.overlaps(d) and a.iou(d) == 0.0


def test_cross_kind_semantics():
    t = Location.text(0, 10)
    bb = Location.bounding_box(0.0, 0.0, 1.0, 1.0)
    tm = Location.temporal(0.0, 2.5)
    assert not t.overlaps(bb) and not bb.overlaps(tm)
    assert t.iou(bb) is None  # only text/bbox define IoU
    assert tm.iou(tm) is None


def test_discontinuous_span():
    d = Location.discontinuous([(10, 14), (0, 4)])
    # entity.rs: segments sorted by start on construction
    assert d.fields["segments"] == [(0, 4), (10, 14)]
    assert d.bounding_range() == (0, 14)
    assert d.total_len() == 8
    assert d.contains(2) and d.contains(11) and not d.contains(5)
    assert d.extract_text("abcdefghijklmno", " ") == "abcd klmn"


def test_arrow_roundtrip_all_kinds():
    locs = [
        Location.text(3, 9),
        Location.bounding_box(0.1, 0.2, 0.3, 0.4, page=1),
        Location.temporal(1.5, 9.25, frame=42),
        Location.cuboid([1, 2, 3], [4, 5, 6], [1, 0, 0, 0]),
        Location.genomic("chr7", 100, 200, "+"),
        Location.discontinuous([(0, 2), (5, 8)]),
        Location.text_with_bbox(0, 4, Location.bounding_box(0.0, 0.0, 0.5, 0.5)),
    ]
    tbl = locations_table(locs)
    assert tbl.schema.field("location").type == ARROW_TYPE
    back = [Location.from_row(r) for r in tbl.column("location").to_pylist()]
    assert [l.kind for l in back] == [l.kind for l in locs]
    assert back[0].fields == {"start": 3, "end": 9}
    assert back[4].fields["contig"] == "chr7" and back[4].fields["strand"] == "+"
    assert back[5].fields["segments"] == [(0, 2), (5, 8)]
    assert back[1].fields["page"] == 1
    assert back[1].fields["width"] == pytest.approx(0.3)
    assert validate_table(tbl) == []


def test_validation_catches_bad_rows():
    tbl = locations_table(
        [
            Location("text", {"start": 9, "end": 3}),
            Location("temporal", {"start_sec": 5.0, "end_sec": 1.0, "frame": None}),
            # a wrong-SIZED vector is unrepresentable (fixed-size list type
            # rejects it at Arrow build time); a missing one is the
            # validator's job
            Location("cuboid", {"center": None, "dimensions": [1, 1, 1], "rotation": [1, 0, 0, 0]}),
            Location("genomic", {"contig": "", "start": 0, "end": 10, "strand": None}),
        ]
    )
    errs = validate_table(tbl)
    assert len(errs) == 4
    assert "bad interval" in errs[0]
    assert "temporal" in errs[1]
    assert "center" in errs[2]
    assert "contig" in errs[3]


def test_pairwise_iou_table():
    a = locations_table([Location.text(0, 10), Location.temporal(0, 1)])
    b = locations_table([Location.text(5, 15), Location.temporal(0, 1)])
    out = pairwise_iou(a, b)
    vals = out.column("iou").to_pylist()
    assert vals[0] == pytest.approx(5 / 15)
    assert vals[1] is None
