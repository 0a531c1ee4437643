"""Alias-dictionary entity linking (J1).

Reimplements ``link_tracks_to_kb`` (/root/reference/anno-cli/src/main.rs:
2417-2487): each track's lowercased canonical surface is looked up in a
wikidata-style alias map; hits get a KB identity (qid), misses get a
placeholder identity.

At web scale the alias table is broadcast once per job (``ray.put``) and read
inside ``map_batches`` workers — a broadcast hash join, never a shuffle.
The pluggable provider mirrors the reference ``Lexicon`` trait
(anno-core/src/entity.rs:885-906).
"""

from __future__ import annotations

# Well-known entities with Wikidata IDs (main.rs:2419-2450).
KNOWN_ENTITIES: dict[str, tuple[str, str]] = {
    "barack obama": ("Q76", "44th President of the United States"),
    "angela merkel": ("Q567", "Chancellor of Germany 2005-2021"),
    "berlin": ("Q64", "Capital of Germany"),
    "nato": ("Q7184", "North Atlantic Treaty Organization"),
    "donald trump": ("Q22686", "45th President of the United States"),
    "joe biden": ("Q6279", "46th President of the United States"),
    "vladimir putin": ("Q7747", "President of Russia"),
    "emmanuel macron": ("Q3052772", "President of France"),
    "elon musk": ("Q317521", "CEO of Tesla and SpaceX"),
    "marie curie": ("Q7186", "Physicist and chemist"),
    "albert einstein": ("Q937", "Theoretical physicist"),
    "new york": ("Q60", "City in New York State"),
    "london": ("Q84", "Capital of the United Kingdom"),
    "paris": ("Q90", "Capital of France"),
    "google": ("Q95", "American technology company"),
    "apple": ("Q312", "American technology company"),
    "microsoft": ("Q2283", "American technology company"),
    "united nations": ("Q1065", "International organization"),
    "european union": ("Q458", "Political and economic union"),
}


def link_surface(
    canonical_surface: str,
    alias_table: dict[str, tuple[str, str]] | None = None,
) -> tuple[str, str]:
    """Return (kb_id, description); empty strings when unlinked."""
    table = KNOWN_ENTITIES if alias_table is None else alias_table
    hit = table.get(canonical_surface.lower())
    if hit is None:
        return ("", "")
    return hit
