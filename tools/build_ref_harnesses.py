"""Rebuild the differential-test harnesses around the ACTUAL reference code.

Three tiny Rust binaries embed reference implementation files directly
(pure-std — no crates.io needed). Reference sources are extracted from
/root/reference at build time into /tmp (never committed); only our shims
and this assembly script live in the repo.

    python tools/build_ref_harnesses.py
    /tmp/refharness/target/release/refharness      # HTML->text  (stdin->stdout)
    /tmp/heurharness/target/release/heurharness    # HeuristicNER (stdin->TSV)
    /tmp/evharness/target/release/evharness        # events+relations (TSV->JSON)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REF = "/root/reference"

COREF_SHIM = '// Shim GroundedDocument just enough for resolve_coreference.\nuse std::collections::HashMap;\nuse std::io::Read;\n\n#[derive(Debug, Clone, PartialEq)]\npub enum Location { Text { start: usize, end: usize } }\nimpl Location {\n    pub fn text(start: usize, end: usize) -> Self { Location::Text { start, end } }\n}\n\n#[derive(Debug, Clone)]\npub struct Signal {\n    pub id: u64,\n    pub location: Location,\n    pub surface: String,\n    pub label: String,\n    pub confidence: f32,\n}\nimpl Signal {\n    pub fn new(id: u64, location: Location, surface: &str, label: &str, confidence: f32) -> Self {\n        Signal { id, location, surface: surface.to_string(), label: label.to_string(), confidence }\n    }\n}\n\n#[derive(Debug, Clone)]\npub struct SignalRef { pub signal_id: u64, pub position: u32 }\n\n#[derive(Debug, Clone)]\npub struct Track {\n    pub id: u64,\n    pub canonical_surface: String,\n    pub signals: Vec<SignalRef>,\n}\nimpl Track {\n    pub fn new(id: u64, canonical: impl Into<String>) -> Self {\n        Track { id, canonical_surface: canonical.into(), signals: Vec::new() }\n    }\n    pub fn add_signal(&mut self, signal_id: u64, position: u32) {\n        self.signals.push(SignalRef { signal_id, position });\n    }\n}\n\n#[derive(Debug, Default)]\npub struct GroundedDocument {\n    signals: Vec<Signal>,\n    tracks: HashMap<u64, Track>,\n    signal_to_track: HashMap<u64, u64>,\n    next_signal_id: u64,\n    next_track_id: u64,\n}\nimpl GroundedDocument {\n    pub fn add_signal(&mut self, mut signal: Signal) -> u64 {\n        let id = self.next_signal_id;\n        signal.id = id;\n        self.signals.push(signal);\n        self.next_signal_id += 1;\n        id\n    }\n    pub fn get_signal(&self, id: u64) -> Option<&Signal> {\n        self.signals.iter().find(|s| s.id == id)\n    }\n    pub fn signals(&self) -> &[Signal] { &self.signals }\n    pub fn add_track(&mut self, mut track: Track) -> u64 {\n        let id = self.next_track_id;\n        track.id = id;\n        for sr in &track.signals { self.signal_to_track.insert(sr.signal_id, id); }\n        self.tracks.insert(id, track);\n        self.next_track_id += 1;\n        id\n    }\n    pub fn get_track(&self, id: u64) -> Option<&Track> { self.tracks.get(&id) }\n    pub fn create_track_from_signals(&mut self, canonical: impl Into<String>, signal_ids: &[u64]) -> Option<u64> {\n        if signal_ids.is_empty() { return None; }\n        let mut track = Track::new(0, canonical);\n        for (pos, &id) in signal_ids.iter().enumerate() { track.add_signal(id, pos as u32); }\n        Some(self.add_track(track))\n    }\n    pub fn add_signal_to_track(&mut self, signal_id: u64, track_id: u64, position: u32) -> bool {\n        if let Some(track) = self.tracks.get_mut(&track_id) {\n            track.add_signal(signal_id, position);\n            self.signal_to_track.insert(signal_id, track_id);\n            true\n        } else { false }\n    }\n    pub fn tracks(&self) -> impl Iterator<Item = &Track> { self.tracks.values() }\n}\n\nfn normalize_entity_name(name: &str) -> String { name.to_lowercase().trim().to_string() }\n\nREPLACED_FNS\n\nfn main() {\n    // stdin: text \\t surface|label|start|end \\x1e ...   (json-ish escapes in text)\n    let mut buf = String::new();\n    std::io::stdin().read_to_string(&mut buf).unwrap();\n    for line in buf.lines() {\n        if line.is_empty() { println!(); continue; }\n        let mut parts = line.splitn(2, \'\\t\');\n        let text = parts.next().unwrap()\n            .replace("\\\\n", "\\n").replace("\\\\t", "\\t").replace("\\\\\\\\", "\\\\");\n        let ents_raw = parts.next().unwrap_or("");\n        let mut doc = GroundedDocument::default();\n        let mut ids = Vec::new();\n        if !ents_raw.is_empty() {\n            for e in ents_raw.split(\'\\x1e\') {\n                let f: Vec<&str> = e.split(\'\\x1f\').collect();\n                if f.len() == 4 {\n                    let s: usize = f[2].parse().unwrap();\n                    let en: usize = f[3].parse().unwrap();\n                    let sig = Signal::new(0, Location::text(s, en), f[0], f[1], 0.9);\n                    ids.push(doc.add_signal(sig));\n                }\n            }\n        }\n        resolve_coreference(&mut doc, &text, &ids);\n        // output: tracks as canonical|span,span,... sorted for determinism\n        let mut out: Vec<String> = doc.tracks().map(|t| {\n            let mut spans: Vec<(usize, usize)> = t.signals.iter().filter_map(|sr| {\n                doc.get_signal(sr.signal_id).map(|s| match s.location { Location::Text { start, end } => (start, end) })\n            }).collect();\n            spans.sort();\n            format!("{}|{}", t.canonical_surface,\n                spans.iter().map(|(a, b)| format!("{}:{}", a, b)).collect::<Vec<_>>().join(","))\n        }).collect();\n        out.sort();\n        println!("{}", out.join("\\x1e"));\n    }\n}\n'

HEUR_MAIN = r'''
// ---- shims for crate items used by heuristic.rs ----
pub type Result<T> = std::result::Result<T, String>;

#[derive(Debug, Clone, PartialEq)]
pub enum EntityType { Person, Organization, Location, Other(String) }
impl EntityType {
    pub fn as_label(&self) -> &str {
        match self { EntityType::Person => "PER", EntityType::Organization => "ORG",
                     EntityType::Location => "LOC", EntityType::Other(s) => s.as_str() }
    }
}

#[derive(Debug, Clone, PartialEq)]
pub enum ExtractionMethod { Heuristic }

#[derive(Debug, Clone)]
pub struct Provenance {
    pub source: String,
    pub method: ExtractionMethod,
    pub pattern: Option<String>,
    pub raw_confidence: Option<f64>,
    pub model_version: Option<String>,
    pub timestamp: Option<String>,
}

#[derive(Debug, Clone)]
pub struct Entity {
    pub text: String,
    pub entity_type: EntityType,
    pub start: usize,
    pub end: usize,
    pub confidence: f64,
    pub provenance: Option<Provenance>,
}
impl Entity {
    pub fn new(text: impl Into<String>, entity_type: EntityType, start: usize, end: usize, confidence: f64) -> Self {
        Entity { text: text.into(), entity_type, start, end, confidence, provenance: None }
    }
    pub fn with_provenance(text: impl Into<String>, entity_type: EntityType, start: usize, end: usize, confidence: f64, p: Provenance) -> Self {
        Entity { text: text.into(), entity_type, start, end, confidence, provenance: Some(p) }
    }
}

pub trait Model { fn extract_entities(&self, text: &str, language: Option<&str>) -> Result<Vec<Entity>>;
    fn supported_types(&self) -> Vec<EntityType>; fn is_available(&self) -> bool;
    fn name(&self) -> &'static str; fn description(&self) -> &'static str; }
pub trait NamedEntityCapable {}
pub trait BatchCapable { fn optimal_batch_size(&self) -> Option<usize> { None } }
pub trait StreamingCapable { fn recommended_chunk_size(&self) -> usize { 8192 } }

pub mod offset {
    pub struct SpanConverter { map: Vec<usize> }
    impl SpanConverter {
        pub fn new(text: &str) -> Self {
            let mut map = vec![0usize; text.len() + 1];
            let mut ci = 0;
            for (bi, _) in text.char_indices() { map[bi] = ci; ci += 1; }
            map[text.len()] = ci;
            SpanConverter { map }
        }
        pub fn byte_to_char(&self, b: usize) -> usize { self.map[b.min(self.map.len()-1)] }
    }
}

use std::io::Read;
fn main() {
    let mut buf = String::new();
    std::io::stdin().read_to_string(&mut buf).unwrap();
    let ner = heuristic::HeuristicNER::new();
    let ents = heuristic::run(&ner, &buf);
    for e in ents {
        let pat = e.provenance.as_ref().and_then(|p| p.pattern.clone()).unwrap_or_default();
        println!("{}\t{}\t{}\t{}\t{:.4}\t{}", e.text.replace('\t', " ").replace('\n', " "), e.entity_type.as_label(), e.start, e.end, e.confidence, pat);
    }
}
mod heuristic {
    include!("heuristic.rs");
    pub fn run(ner: &HeuristicNER, text: &str) -> Vec<crate::Entity> {
        use crate::Model;
        ner.extract_entities(text, None).unwrap()
    }
}
'''

EV_MAIN = r'''// Differential harness around the reference event extractor + pair relations.
// Input: JSON lines {"text": ..., "entities": [{"text","label","start","end","conf"}]}
// Output per line: JSON {"relations": [...], "events": [...]}
use std::io::{BufRead, Write};

#[derive(Debug, Clone)]
pub struct EntityTypeShim(pub String);
impl EntityTypeShim { pub fn as_label(&self) -> &str { &self.0 } }

#[derive(Debug, Clone)]
pub struct Entity {
    pub text: String,
    pub entity_type: EntityTypeShim,
    pub start: usize,
    pub end: usize,
    pub confidence: f64,
    pub canonical_id: Option<u64>,
}

#[derive(Debug, Clone)]
pub struct RelationPrediction {
    pub head_span: (usize, usize),
    pub head_type: String,
    pub tail_span: (usize, usize),
    pub tail_type: String,
    pub relation_type: String,
    pub confidence: f64,
}

pub mod types { include!("types.rs"); }
pub mod event_extractor { include!("event_extractor.rs"); }
mod relations { use crate::{Entity, RelationPrediction}; include!("relations.rs");
    pub fn cepr(e: &[Entity], t: &str, r: &[&str]) -> Vec<RelationPrediction> { create_entity_pair_relations(e, t, r) } }
use relations::cepr;
pub type Result<T> = std::result::Result<T, String>;

// --- minimal JSON parsing (std only) ---
fn json_str(s: &str) -> String {
    let mut out = String::new();
    let mut chars = s.chars();
    while let Some(c) = chars.next() {
        if c == '\\' {
            match chars.next() {
                Some('n') => out.push('\n'), Some('t') => out.push('\t'),
                Some('r') => out.push('\r'), Some('"') => out.push('"'),
                Some('\\') => out.push('\\'), Some('/') => out.push('/'),
                Some('u') => {
                    let h: String = chars.by_ref().take(4).collect();
                    if let Ok(n) = u32::from_str_radix(&h, 16) {
                        if (0xD800..0xDC00).contains(&n) {
                            // surrogate pair
                            let _ = chars.next(); let _ = chars.next(); // \u
                            let h2: String = chars.by_ref().take(4).collect();
                            if let Ok(n2) = u32::from_str_radix(&h2, 16) {
                                let cp = 0x10000 + ((n - 0xD800) << 10) + (n2 - 0xDC00);
                                if let Some(ch) = char::from_u32(cp) { out.push(ch); }
                            }
                        } else if let Some(ch) = char::from_u32(n) { out.push(ch); }
                    }
                }
                Some(other) => out.push(other),
                None => {}
            }
        } else { out.push(c); }
    }
    out
}

fn esc(s: &str) -> String {
    let mut o = String::new();
    for c in s.chars() {
        match c {
            '"' => o.push_str("\\\""), '\\' => o.push_str("\\\\"),
            '\n' => o.push_str("\\n"), '\t' => o.push_str("\\t"), '\r' => o.push_str("\\r"),
            c if (c as u32) < 0x20 => o.push_str(&format!("\\u{:04x}", c as u32)),
            c => o.push(c),
        }
    }
    o
}

fn main() {
    let stdin = std::io::stdin();
    let stdout = std::io::stdout();
    let mut out = stdout.lock();
    let ex = event_extractor::EventExtractor::new();
    for line in stdin.lock().lines() {
        let line = line.unwrap();
        if line.trim().is_empty() { continue; }
        // input format is TSV-encoded to dodge hand-rolled JSON parsing:
        // text_json_escaped \t ent1_text|label|start|end|conf \x1e ent2...
        let mut parts = line.splitn(2, '\t');
        let text = json_str(parts.next().unwrap());
        let ents_raw = parts.next().unwrap_or("");
        let mut entities = Vec::new();
        if !ents_raw.is_empty() {
            for e in ents_raw.split('\x1e') {
                let f: Vec<&str> = e.split('\x1f').collect();
                if f.len() == 5 {
                    entities.push(Entity {
                        text: json_str(f[0]),
                        entity_type: EntityTypeShim(f[1].to_string()),
                        start: f[2].parse().unwrap(),
                        end: f[3].parse().unwrap(),
                        confidence: f[4].parse().unwrap(),
                        canonical_id: None,
                    });
                }
            }
        }
        let rels = cepr(&entities, &text, &[]);
        let evs = ex.extract_with_entities(&text, &entities);
        let mut line_out = String::from("{\"relations\":[");
        for (i, r) in rels.iter().enumerate() {
            if i > 0 { line_out.push(','); }
            line_out.push_str(&format!(
                "[{},{},{},{},\"{}\",{}]",
                r.head_span.0, r.head_span.1, r.tail_span.0, r.tail_span.1,
                esc(&r.relation_type), r.confidence));
        }
        line_out.push_str("],\"events\":[");
        for (i, ev) in evs.iter().enumerate() {
            if i > 0 { line_out.push(','); }
            let args: Vec<String> = ev.arguments.iter()
                .map(|(r, v)| format!("[\"{}\",\"{}\"]", esc(r), esc(v))).collect();
            line_out.push_str(&format!(
                "[\"{}\",{},{},\"{}\",\"{:?}\",\"{}\",{},[{}]]",
                esc(&ev.trigger), ev.trigger_start, ev.trigger_end,
                ev.trigger_type.clone().unwrap_or_default(),
                ev.polarity,
                ev.tense.map(|t| format!("{:?}", t)).unwrap_or_default(),
                ev.confidence, args.join(",")));
        }
        line_out.push_str("]}");
        writeln!(out, "{}", line_out).unwrap();
    }
}
'''


def _balanced_fn(src: str, marker: str) -> str:
    start = src.index(marker)
    i = src.index("{", start)
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return src[start : j + 1]
    raise ValueError(marker)


def _strip_docs(src: str) -> str:
    return "\n".join(l for l in src.split("\n") if not l.startswith("//!"))


def _cargo_toml(name: str) -> str:
    return f'[package]\nname = "{name}"\nversion = "0.1.0"\nedition = "2021"\n'


def build_refharness() -> None:
    os.makedirs("/tmp/refharness/src", exist_ok=True)
    src = open(f"{REF}/anno/src/ingest/url_resolver.rs", encoding="utf-8").read()
    fn = _balanced_fn(src, "fn extract_text_from_html").replace("&self, ", "")
    fn = re.sub(r"#\[allow\(dead_code\)\][^\n]*\n", "", fn)
    main = (
        "use std::io::Read;\n" + fn + "\n"
        "fn main() {\n"
        "    let mut buf = String::new();\n"
        "    std::io::stdin().read_to_string(&mut buf).unwrap();\n"
        "    print!(\"{}\", extract_text_from_html(&buf));\n"
        "}\n"
    )
    open("/tmp/refharness/src/main.rs", "w", encoding="utf-8").write(main)
    open("/tmp/refharness/Cargo.toml", "w", encoding="utf-8").write(_cargo_toml("refharness"))
    subprocess.run(["cargo", "build", "--release"], cwd="/tmp/refharness", check=True)


def build_heurharness() -> None:
    os.makedirs("/tmp/heurharness/src", exist_ok=True)
    heur = _strip_docs(open(f"{REF}/anno/src/backends/heuristic.rs", encoding="utf-8").read())
    open("/tmp/heurharness/src/heuristic.rs", "w", encoding="utf-8").write(heur)
    open("/tmp/heurharness/src/main.rs", "w", encoding="utf-8").write(HEUR_MAIN)
    open("/tmp/heurharness/Cargo.toml", "w", encoding="utf-8").write(_cargo_toml("heurharness"))
    subprocess.run(["cargo", "build", "--release"], cwd="/tmp/heurharness", check=True)


def build_evharness() -> None:
    os.makedirs("/tmp/evharness/src", exist_ok=True)
    types = _strip_docs(open(f"{REF}/anno/src/discourse/types.rs", encoding="utf-8").read())
    types = types.replace(", Serialize, Deserialize", "").replace("Serialize, Deserialize, ", "").replace("Serialize, Deserialize", "")
    types = re.sub(r"#\[serde\([^\)]*\)\]\n", "", types)
    types = types.replace("use serde::{Deserialize, Serialize};", "")
    types = types.replace("use anno_core::Entity;", "use crate::Entity;")
    open("/tmp/evharness/src/types.rs", "w", encoding="utf-8").write(types)

    ev = _strip_docs(open(f"{REF}/anno/src/discourse/event_extractor.rs", encoding="utf-8").read())
    ev = ev.replace(
        "use super::{DiscourseReferent, EventMention, EventPolarity, EventTense, ReferentType};",
        "use crate::types::{DiscourseReferent, EventMention, EventPolarity, EventTense, ReferentType};",
    )
    ev = ev.replace("use anno_core::Entity;", "use crate::Entity;")
    open("/tmp/evharness/src/event_extractor.rs", "w", encoding="utf-8").write(ev)

    cli = open(f"{REF}/anno-cli/src/main.rs", encoding="utf-8").read()
    rel = _balanced_fn(cli, "fn create_entity_pair_relations")
    rel = rel.replace(
        "-> Vec<anno::eval::relation::RelationPrediction> {\n    use anno::eval::relation::RelationPrediction;",
        "-> Vec<RelationPrediction> {",
    )
    open("/tmp/evharness/src/relations.rs", "w", encoding="utf-8").write(rel)
    open("/tmp/evharness/src/main.rs", "w", encoding="utf-8").write(EV_MAIN)
    open("/tmp/evharness/Cargo.toml", "w", encoding="utf-8").write(_cargo_toml("evharness"))
    subprocess.run(["cargo", "build", "--release"], cwd="/tmp/evharness", check=True)


def _balanced_from(src: str, marker: str) -> str:
    return _balanced_fn(src, marker)


def build_corefharness() -> None:
    os.makedirs("/tmp/corefharness/src", exist_ok=True)
    cli = open(f"{REF}/anno-cli/src/main.rs", encoding="utf-8").read()
    fns = "\n\n".join(
        _balanced_from(cli, m)
        for m in ("fn resolve_coreference", "fn is_likely_male", "fn is_likely_female")
    )
    open("/tmp/corefharness/src/main.rs", "w", encoding="utf-8").write(
        COREF_SHIM.replace("REPLACED_FNS", fns)
    )
    open("/tmp/corefharness/Cargo.toml", "w", encoding="utf-8").write(_cargo_toml("corefharness"))
    subprocess.run(["cargo", "build", "--release"], cwd="/tmp/corefharness", check=True)


SIMPLECOREF_MAIN = r'''
// Shims for SimpleCorefResolver (eval/coref_resolver.rs). The resolver's
// canonical map is aliased to BTreeMap so strategy-3 iteration is SORTED —
// the reference's HashMap order is unspecified; our Python port iterates in
// sorted order and this harness makes the reference do the same, so any
// mismatch is a real semantic bug, not map-order noise.
use std::collections::BTreeMap as HashMap;
use std::io::Read;

#[derive(Debug, Clone, PartialEq)]
pub enum EntityType { Person, Organization, Location, Other(String) }
impl EntityType {
    pub fn as_label(&self) -> &str {
        match self { EntityType::Person => "PER", EntityType::Organization => "ORG",
                     EntityType::Location => "LOC", EntityType::Other(s) => s.as_str() }
    }
    pub fn from_label(s: &str) -> Self {
        match s { "PER" => EntityType::Person, "ORG" => EntityType::Organization,
                  "LOC" => EntityType::Location, other => EntityType::Other(other.to_string()) }
    }
}

#[derive(Debug, Clone)]
pub struct Entity {
    pub text: String,
    pub entity_type: EntityType,
    pub start: usize,
    pub end: usize,
    pub confidence: f64,
    pub canonical_id: Option<u64>,
}
impl Entity {
    pub fn new(text: impl Into<String>, entity_type: EntityType, start: usize, end: usize, confidence: f64) -> Self {
        Entity { text: text.into(), entity_type, start, end, confidence, canonical_id: None }
    }
}

REPLACED_FNS

fn main() {
    // stdin lines: [NF\t]ent\x1eent...  ent = text\x1flabel\x1fstart\x1fend
    // output: canonical ids comma-joined
    let mut buf = String::new();
    std::io::stdin().read_to_string(&mut buf).unwrap();
    for line in buf.lines() {
        if line.is_empty() { println!(); continue; }
        let (cfg, ents_raw) = match line.split_once('\t') {
            Some((c, rest)) if c == "NF" => (CorefConfig { fuzzy_matching: false, ..CorefConfig::default() }, rest),
            _ => (CorefConfig::default(), line),
        };
        let mut entities = Vec::new();
        for e in ents_raw.split('\x1e') {
            let f: Vec<&str> = e.split('\x1f').collect();
            if f.len() == 4 {
                entities.push(Entity::new(
                    f[0], EntityType::from_label(f[1]),
                    f[2].parse().unwrap(), f[3].parse().unwrap(), 0.9));
            }
        }
        let resolver = SimpleCorefResolver::new(cfg);
        let resolved = resolver.resolve(&entities);
        let ids: Vec<String> = resolved.iter()
            .map(|e| e.canonical_id.map(|i| i.to_string()).unwrap_or_default())
            .collect();
        println!("{}", ids.join(","));
    }
}
'''


def build_simplecorefharness() -> None:
    os.makedirs("/tmp/simplecorefharness/src", exist_ok=True)
    src = open(f"{REF}/anno/src/eval/coref_resolver.rs", encoding="utf-8").read()
    parts = [
        _balanced_fn(src, "pub struct CorefConfig"),
        _balanced_fn(src, "impl Default for CorefConfig"),
        _balanced_fn(src, "pub struct SimpleCorefResolver"),
        _balanced_fn(src, "impl Default for SimpleCorefResolver"),
    ]
    impl = _balanced_fn(src, "impl SimpleCorefResolver")
    # resolve_to_chains needs CorefChain (not shimmed): drop that one method
    chains_fn = _balanced_fn(impl, "pub fn resolve_to_chains")
    impl = impl.replace(chains_fn, "")
    impl = re.sub(r"#\[must_use\]\s*\n(\s*)(?=\s*})", "", impl)
    parts.append(impl)
    fns = "\n\n".join(parts)
    open("/tmp/simplecorefharness/src/main.rs", "w", encoding="utf-8").write(
        SIMPLECOREF_MAIN.replace("REPLACED_FNS", fns)
    )
    open("/tmp/simplecorefharness/Cargo.toml", "w", encoding="utf-8").write(
        _cargo_toml("simplecorefharness")
    )
    subprocess.run(["cargo", "build", "--release"], cwd="/tmp/simplecorefharness", check=True)


def main() -> int:
    build_refharness()
    build_heurharness()
    build_evharness()
    build_corefharness()
    build_simplecorefharness()
    print("all harnesses built under /tmp/{ref,heur,ev,coref,simplecoref}harness")
    return 0


if __name__ == "__main__":
    sys.exit(main())
