"""Shared access to the SAGE-generated reference test vectors."""

import json
from pathlib import Path

VECTOR_DIR = Path(__file__).parent / "vectors"


def load_vectors(field: str, instance: str) -> dict:
    raw = json.loads((VECTOR_DIR / f"{field}_{instance}.json").read_text())

    def to_int(obj):
        if isinstance(obj, str):
            return int(obj)
        if isinstance(obj, list):
            return [to_int(x) for x in obj]
        if isinstance(obj, dict):
            return {k: to_int(v) for k, v in obj.items()}
        return obj

    return to_int(raw)


def all_vector_keys():
    for path in sorted(VECTOR_DIR.glob("*.json")):
        field, inst = path.stem.split("_anemoi_")
        yield field, "anemoi_" + inst
