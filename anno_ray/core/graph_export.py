"""Graph exporters: Cypher, NetworkX JSON, JSON-LD (S6).

Reimplements ``GraphDocument::{to_cypher, to_networkx_json, to_json_ld}``
(/root/reference/anno-core/src/graph.rs:386-573) over the engine's node/edge
tables. Driver-side post-materialize formatting — the node/edge Parquet is
the canonical output; these are small export views.
"""

from __future__ import annotations

import json
from collections import defaultdict

import pyarrow as pa


def escape_cypher_string(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def sanitize_cypher_name(s: str) -> str:
    return "".join(c if (c.isalnum() or c == "_") else "_" for c in s)


def _node_rows(nodes: pa.Table) -> list[dict]:
    return nodes.to_pylist()


def _edge_rows(edges: pa.Table) -> list[dict]:
    return edges.to_pylist()


def to_cypher(nodes: pa.Table, edges: pa.Table) -> str:
    """CREATE statements (graph.rs:386-421). Node properties beyond name
    (mentions_count, first_seen) are emitted like Cypher number props."""
    out: list[str] = []
    for n in _node_rows(nodes):
        props = [f"name: '{escape_cypher_string(n.get('name', ''))}'"]
        for key in ("mentions_count", "first_seen"):
            if key in n and n[key] is not None:
                props.append(f"{key}: {n[key]}")
        out.append(
            "CREATE (n%s:%s {id: '%s', %s});\n"
            % (
                sanitize_cypher_name(n["node_id"]),
                sanitize_cypher_name(n.get("node_type", "Entity")),
                escape_cypher_string(n["node_id"]),
                ", ".join(props),
            )
        )
    out.append("\n")
    for e in _edge_rows(edges):
        conf = e.get("conf", 1.0)
        props = f" {{confidence: {conf:.3f}}}" if conf < 1.0 else ""
        out.append(
            "MATCH (a {id: '%s'}), (b {id: '%s'}) CREATE (a)-[:%s%s]->(b);\n"
            % (
                escape_cypher_string(e["subj_node"]),
                escape_cypher_string(e["obj_node"]),
                sanitize_cypher_name(e["pred"]),
                props,
            )
        )
    return "".join(out)


def to_networkx_json(nodes: pa.Table, edges: pa.Table) -> str:
    """node_link_graph-compatible JSON (graph.rs:434-497)."""
    g = {
        "directed": True,
        "multigraph": False,
        "graph": {},
        "nodes": [
            {
                "id": n["node_id"],
                "type": n.get("node_type", ""),
                "name": n.get("name", ""),
                **{
                    k: n[k]
                    for k in ("mentions_count", "first_seen")
                    if k in n and n[k] is not None
                },
            }
            for n in _node_rows(nodes)
        ],
        "links": [
            {
                "source": e["subj_node"],
                "target": e["obj_node"],
                "relation": e["pred"],
                **(
                    {"confidence": e["conf"]}
                    if abs(e.get("conf", 1.0) - 1.0) > 1e-15
                    else {}
                ),
            }
            for e in _edge_rows(edges)
        ],
    }
    return json.dumps(g, indent=2)


def to_json_ld(nodes: pa.Table, edges: pa.Table) -> str:
    """schema.org JSON-LD (graph.rs:501-573)."""
    by_source: dict[str, list[dict]] = defaultdict(list)
    for e in _edge_rows(edges):
        by_source[e["subj_node"]].append(e)
    graph = []
    for n in _node_rows(nodes):
        node: dict = {
            "@id": n["node_id"],
            "@type": n.get("node_type", ""),
            "name": n.get("name", ""),
        }
        rels = [
            {"@type": e["pred"], "target": e["obj_node"]}
            for e in by_source.get(n["node_id"], [])
        ]
        if rels:
            node["relations"] = rels
        graph.append(node)
    doc = {
        "@context": {
            "@vocab": "http://schema.org/",
            "name": "http://schema.org/name",
            "type": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        },
        "@graph": graph,
    }
    return json.dumps(doc, indent=2)


def export(nodes: pa.Table, edges: pa.Table, fmt: str) -> str:
    if fmt == "cypher":
        return to_cypher(nodes, edges)
    if fmt == "networkx":
        return to_networkx_json(nodes, edges)
    if fmt in ("jsonld", "json-ld"):
        return to_json_ld(nodes, edges)
    raise ValueError(f"unknown graph export format: {fmt}")
