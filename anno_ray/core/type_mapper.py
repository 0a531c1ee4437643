"""Label harmonization: TypeMapper with dataset presets (P11).

Reimplements ``TypeMapper`` (/root/reference/anno-core/src/entity.rs:504-679)
over string labels: case-insensitive source-label -> canonical label mapping
with `from_label` fallback, plus the reference's dataset presets
(mit_movie / mit_restaurant / biomedical / social_media / manufacturing).
Used as a dict lookup inside batch kernels (never a shuffle).
"""

from __future__ import annotations

from .types import from_label


class TypeMapper:
    def __init__(self, mappings: dict[str, str] | None = None):
        self.mappings: dict[str, str] = {}
        for k, v in (mappings or {}).items():
            self.add(k, v)

    def add(self, source: str, target: str) -> None:
        self.mappings[source.upper()] = target

    def map(self, label: str) -> str | None:
        return self.mappings.get(label.upper())

    def normalize(self, label: str) -> str:
        hit = self.map(label)
        return hit if hit is not None else from_label(label)

    def __contains__(self, label: str) -> bool:
        return label.upper() in self.mappings

    def labels(self) -> list[str]:
        return sorted(self.mappings)

    # --- dataset presets (entity.rs:517-646) --------------------------------

    @classmethod
    def mit_movie(cls) -> TypeMapper:
        return cls({
            "ACTOR": "PER", "DIRECTOR": "PER", "CHARACTER": "PER",
            "TITLE": "WORK_OF_ART", "GENRE": "GENRE", "YEAR": "DATE",
            "RATING": "RATING", "PLOT": "PLOT",
        })

    @classmethod
    def mit_restaurant(cls) -> TypeMapper:
        return cls({
            "RESTAURANT_NAME": "ORG", "LOCATION": "LOC", "CUISINE": "CUISINE",
            "DISH": "DISH", "PRICE": "MONEY", "AMENITY": "AMENITY",
            "HOURS": "TIME",
        })

    @classmethod
    def biomedical(cls) -> TypeMapper:
        return cls({
            "DISEASE": "DISEASE", "CHEMICAL": "CHEMICAL", "DRUG": "DRUG",
            "GENE": "GENE", "PROTEIN": "PROTEIN", "DNA": "DNA", "RNA": "RNA",
            "CELL_LINE": "CELL_LINE", "CELL_TYPE": "CELL_TYPE",
        })

    @classmethod
    def social_media(cls) -> TypeMapper:
        return cls({
            "PERSON": "PER", "CORPORATION": "ORG", "LOCATION": "LOC",
            "GROUP": "ORG", "PRODUCT": "PRODUCT",
            "CREATIVE_WORK": "WORK_OF_ART", "EVENT": "EVENT",
        })

    @classmethod
    def manufacturing(cls) -> TypeMapper:
        return cls({
            "MATE": "MATERIAL", "MANP": "PROCESS", "MACEQ": "MACHINE",
            "APPL": "APPLICATION", "FEAT": "FEATURE", "PARA": "PARAMETER",
            "PRO": "PROPERTY", "CHAR": "CHARACTERISTIC",
            "ENAT": "ENABLING_TECHNOLOGY", "CONPRI": "CONCEPT_PRINCIPLE",
            "BIOP": "BIO_PROCESS", "MANS": "MAN_STANDARD",
        })


PRESETS = {
    "mit_movie": TypeMapper.mit_movie,
    "mit_restaurant": TypeMapper.mit_restaurant,
    "biomedical": TypeMapper.biomedical,
    "social_media": TypeMapper.social_media,
    "manufacturing": TypeMapper.manufacturing,
}
