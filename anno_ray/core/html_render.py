"""S7: HTML debug renderer — entity-highlighted document pages.

Port of ``render_document_html`` (/root/reference/anno-core/src/grounded.rs:
2123-2300): the same dark-theme layout (stats strip, annotated text box,
level tables), the same label->CSS-class mapping, the same annotation
algorithm (sort by start then longer-first, skip nested/overlapping spans,
clamp to char range, char-based slicing), and the same 4-entity
``html_escape``. Driver/debug-side only — never part of a Ray stage.
"""

from __future__ import annotations

_CSS = """*{box-sizing:border-box;margin:0;padding:0}
body{font:12px/1.4 monospace;background:#0a0a0a;color:#b0b0b0;padding:8px}
h1,h2,h3{color:#fff;font-weight:normal;border-bottom:1px solid #333;padding:4px 0;margin:16px 0 8px}
h1{font-size:14px}h2{font-size:12px}h3{font-size:11px;color:#888}
table{width:100%;border-collapse:collapse;font-size:11px;margin:4px 0}
th,td{padding:4px 8px;text-align:left;border:1px solid #222}
th{background:#111;color:#666;font-weight:normal;text-transform:uppercase;font-size:10px}
tr:hover{background:#111}
.grid{display:grid;grid-template-columns:repeat(auto-fit,minmax(300px,1fr));gap:8px}
.panel{border:1px solid #222;background:#0d0d0d;padding:8px}
.text-box{background:#080808;border:1px solid #222;padding:8px;white-space:pre-wrap;word-break:break-word;line-height:1.6}
.e{padding:1px 2px;border-bottom:1px solid}
.e-per{background:#1a1a2e;border-color:#4a4a8a;color:#8888cc}
.e-org{background:#1a2e1a;border-color:#4a8a4a;color:#88cc88}
.e-loc{background:#2e2e1a;border-color:#8a8a4a;color:#cccc88}
.e-misc{background:#1a1a1a;border-color:#4a4a4a;color:#999}
.e-date{background:#2e1a1a;border-color:#8a4a4a;color:#cc8888}
.conf{color:#666;font-size:10px}
.stats{display:flex;gap:16px;padding:8px 0;border-bottom:1px solid #222;margin-bottom:8px}
.stat{text-align:center}.stat-v{font-size:18px;color:#fff}.stat-l{font-size:9px;color:#555;text-transform:uppercase}
.id{color:#444;font-size:9px}
"""


def html_escape(s: str) -> str:
    """The reference's 4-entity escape (grounded.rs:2299-2304)."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _css_class(label: str) -> str:
    up = label.upper()
    if up in ("PER", "PERSON"):
        return "e-per"
    if up in ("ORG", "ORGANIZATION", "COMPANY"):
        return "e-org"
    if up in ("LOC", "LOCATION", "GPE"):
        return "e-loc"
    if up in ("DATE", "TIME"):
        return "e-date"
    return "e-misc"


def annotate_text_html(text: str, mentions) -> str:
    """Entity-highlighted text (grounded.rs:2306-2380): annotations sorted by
    (start asc, end desc) so longer spans win; nested/overlapping spans are
    skipped; offsets clamped to the char count; slices are char-based."""
    annotations = sorted(
        (
            (m.start, m.end, m.label, m.conf, i)
            for i, m in enumerate(mentions)
        ),
        key=lambda a: (a[0], -a[1]),
    )
    out: list[str] = []
    last_end = 0
    n = len(text)
    for start, end, label, conf, sid in annotations:
        start = min(start, n)
        end = min(end, n)
        if start < last_end:
            continue
        if start > last_end:
            out.append(html_escape(text[last_end:start]))
        out.append(
            '<span class="e %s" title="S%d %s [%d,%d) conf=%.2f">%s</span>'
            % (
                _css_class(label), sid, html_escape(label), start, end,
                conf, html_escape(text[start:end]),
            )
        )
        last_end = max(last_end, end)
    if last_end < n:
        out.append(html_escape(text[last_end:]))
    return "".join(out)


def render_document_html(doc_result, doc_id: str = "") -> str:
    """DocResult -> standalone debug page (ProcessResult::to_html analog)."""
    res = doc_result
    mentions = res.mentions
    tracks = res.tracks
    avg_conf = (
        sum(m.conf for m in mentions) / len(mentions) if mentions else 0.0
    )
    linked = sum(1 for t in tracks if any(
        mentions[i].kb_id for i in t.mention_idxs if i < len(mentions)
    ))
    parts: list[str] = []
    parts.append(
        "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"UTF-8\">\n"
        "<title>anno_ray::DocResult</title>\n<style>\n" + _CSS + "</style>\n"
        "</head>\n<body>\n"
    )
    parts.append(
        '<h1>doc_id="%s" len=%d</h1>'
        % (html_escape(doc_id or res.url), len(res.text))
    )
    parts.append('<div class="stats">')
    for value, label in (
        (len(mentions), "signals"),
        (len(tracks), "tracks"),
        (len(res.triples), "triples"),
        ("%.2f" % avg_conf, "avg_conf"),
        (linked, "linked"),
        (res.n_events, "events"),
    ):
        parts.append(
            '<div class="stat"><div class="stat-v">%s</div>'
            '<div class="stat-l">%s</div></div>' % (value, label)
        )
    parts.append("</div>")

    parts.append("<h2>text</h2>")
    parts.append('<div class="text-box">%s</div>' % annotate_text_html(res.text, mentions))

    parts.append('<div class="grid">')
    # level 1: signals
    parts.append('<div class="panel"><h3>signals (level 1)</h3><table>')
    parts.append(
        "<tr><th>id</th><th>span</th><th>surface</th><th>label</th>"
        "<th>conf</th><th>track</th></tr>"
    )
    for i, m in enumerate(mentions):
        track = "T%d" % m.track_id if m.track_id >= 0 else "-"
        neg = " NEG" if m.negated else ""
        parts.append(
            '<tr><td class="id">S%d</td><td>[%d,%d)</td><td>%s</td>'
            '<td>%s%s</td><td class="conf">%.2f</td><td class="id">%s</td></tr>'
            % (i, m.start, m.end, html_escape(m.text), html_escape(m.label),
               neg, m.conf, track)
        )
    parts.append("</table></div>")
    # level 2: tracks
    parts.append('<div class="panel"><h3>tracks (level 2)</h3><table>')
    parts.append(
        "<tr><th>id</th><th>canonical</th><th>type</th><th>|S|</th>"
        "<th>signals</th><th>kb</th></tr>"
    )
    for t in tracks:
        sigs = " ".join("S%d" % i for i in t.mention_idxs)
        kb = next(
            (mentions[i].kb_id for i in t.mention_idxs
             if i < len(mentions) and mentions[i].kb_id),
            "-",
        )
        parts.append(
            '<tr><td class="id">T%d</td><td>%s</td><td>%s</td><td>%d</td>'
            '<td class="id">%s</td><td class="id">%s</td></tr>'
            % (t.track_id, html_escape(t.canonical_surface),
               html_escape(t.entity_type), len(t.mention_idxs),
               html_escape(sigs), html_escape(kb))
        )
    parts.append("</table></div>")
    # level 3: triples
    parts.append('<div class="panel"><h3>triples</h3><table>')
    parts.append("<tr><th>subj</th><th>pred</th><th>obj</th><th>conf</th><th>src</th></tr>")
    for tr in res.triples:
        parts.append(
            '<tr><td>%s</td><td>%s</td><td>%s</td><td class="conf">%.2f</td>'
            '<td class="id">%s</td></tr>'
            % (html_escape(tr["subj"]), html_escape(tr["pred"]),
               html_escape(tr["obj"]), tr["conf"], html_escape(tr["source"]))
        )
    parts.append("</table></div>")
    parts.append("</div>\n</body>\n</html>\n")
    return "".join(parts)
