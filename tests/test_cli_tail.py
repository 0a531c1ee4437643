"""Smoke tests for the CLI long tail (anno-cli parity commands:
validate / analyze / compare / enhance / query / batch / cache / config /
info / benchmark — anno-cli/src/main.rs:217-292)."""

from __future__ import annotations

import json
import os

import pytest

from anno_ray.__main__ import main

TEXT = (
    "John Smith, CEO of Acme Corp, met Jane Doe in Paris on March 5, 2021. "
    "He said Acme Corp earned $4.2 million. Contact jsmith@acme.com."
)


def test_validate_ok_and_errors(tmp_path, capsys):
    good = tmp_path / "good.jsonl"
    good.write_text(
        json.dumps(
            {"url": "d1", "text": "Acme hired Bob.",
             "mentions": [{"start": 0, "end": 4, "label": "ORG", "text": "Acme"}]}
        )
        + "\n"
    )
    assert main(["validate", str(good)]) == 0
    assert "OK" in capsys.readouterr().out

    bad = tmp_path / "bad.jsonl"
    bad.write_text(
        "\n".join(
            [
                "not json at all {",
                json.dumps({"url": "d2", "text": "hi",
                            "mentions": [{"start": 5, "end": 2, "label": "X"}]}),
                json.dumps({"url": "d3", "text": "hi",
                            "mentions": [{"start": 0, "end": 99, "label": "X"}]}),
                json.dumps({"url": "d4", "text": "hi there",
                            "mentions": [{"start": 0, "end": 2, "label": "X",
                                          "text": "zz"}]}),
            ]
        )
        + "\n"
    )
    assert main(["validate", str(bad)]) == 1
    out = capsys.readouterr().out
    assert "invalid JSON" in out
    assert "bad span" in out
    assert "exceeds" in out
    assert "text mismatch" in out


def test_analyze_and_compare(capsys):
    assert main(["analyze", "--text", TEXT]) == 0
    out = capsys.readouterr().out
    assert "regex" in out and "heuristic" in out
    assert "pairwise span agreement" in out

    assert main(["compare", "--a", "regex", "--b", "heuristic", "--text", TEXT]) == 0
    out = capsys.readouterr().out
    assert "both=" in out and "only_regex=" in out


def test_enhance(tmp_path, capsys):
    rec = tmp_path / "doc.json"
    rec.write_text(json.dumps({"url": "u1", "text": TEXT}))
    assert main(["enhance", "--file", str(rec), "--coref", "simple"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["url"] == "u1"
    assert out["mentions"] and out["tracks"] is not None
    for m in out["mentions"]:
        assert out["text"][m["start"]:m["end"]] == m["text"]


def test_config_and_info_and_cache_list(tmp_path, capsys):
    assert main(["config"]) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["driver_surface_max"] == 2_000_000
    assert cfg["minhash_cc_driver_max_pairs"] == 500_000

    save = tmp_path / "cfg.json"
    assert main(["config", "--save", str(save)]) == 0
    capsys.readouterr()
    assert json.loads(save.read_text())["broadcast_map_max"] == 1_000_000

    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "ray" in out and "extractors:" in out

    assert main(["cache", "list"]) == 0
    assert "total:" in capsys.readouterr().out


def test_benchmark(capsys):
    assert main(["benchmark", "--docs", "5"]) == 0
    out = capsys.readouterr().out
    assert "docs/s" in out and "regex" in out


def test_batch_and_query(ray_session, tmp_path, capsys):
    src = tmp_path / "docs"
    src.mkdir()
    for i in range(3):
        (src / f"d{i}.txt").write_text(TEXT)
    out_dir = str(tmp_path / "out_jsonl")
    assert main(["batch", "--dir", str(src), "--out", out_dir]) == 0
    capsys.readouterr()
    files = [f for f in os.listdir(out_dir) if not f.startswith(".")]
    assert files
    n_lines = 0
    for f in files:
        with open(os.path.join(out_dir, f), encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    json.loads(line)
                    n_lines += 1
    assert n_lines == 3

    # query runs against the tiny kg fixture output if present
    kg = "/tmp/anno_ray_pages_500_kg"
    if os.path.isdir(os.path.join(kg, "nodes")):
        assert main(["query", "--kg", kg, "--min-mentions", "2", "--limit", "5"]) == 0
        assert capsys.readouterr().out.strip()


def test_corpus_analyses(ray_session, capsys):
    sf = "/root/testdata/sf0.001"
    assert main([
        "corpus", os.path.join(sf, "lineitem.parquet"),
        "--quantiles", "l_extendedprice", "--qs", "0.5",
        "--distinct", "l_partkey",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    import duckdb

    con = duckdb.connect()
    med, nd = con.execute(
        f"SELECT median(l_extendedprice), COUNT(DISTINCT l_partkey) "
        f"FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()
    assert abs(out["quantiles"]["0.5"] - med) < 1e-9
    approx = out["approx_distinct"]["l_partkey"]
    assert abs(approx - nd) / nd < 0.02
    # no-op invocation is a usage error
    assert main(["corpus", os.path.join(sf, "lineitem.parquet")]) == 2


def test_graph_analytics_cli(ray_session, capsys, tmp_path):
    """graph pagerank/degree/components over a tiny materialized kg."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    kg = tmp_path / "kg"
    (kg / "edges" / "part=00000").mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "subj_node": pa.array(["a", "a", "b", "x"], pa.string()),
                "obj_node": pa.array(["b", "c", "c", "y"], pa.string()),
            }
        ),
        str(kg / "edges" / "part=00000" / "data.parquet"),
    )
    assert main(["graph", "pagerank", "--kg", str(kg), "--top", "2"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2 and "pr_norm" in lines[0]

    assert main(["graph", "components", "--kg", str(kg), "--top", "10"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0] == {"nodes": 5, "components": 2}
    assert {(r["component"], r["size"]) for r in lines[1:]} == {("a", 3), ("x", 2)}

    assert main(["graph", "degree", "--kg", str(kg), "--top", "1"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["node_id"] == "a" and row["out_deg"] == 2

    # missing edges dir is a usage error
    assert main(["graph", "pagerank", "--kg", str(tmp_path / "nope")]) == 2
