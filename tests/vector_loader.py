"""Loader for the vendored ethereum/bls12-381-tests v0.1.2 JSON vectors
(reference tests/tests.rs:6-29 generic directory-scan loader)."""

import json
import pathlib

VECTOR_DIR = pathlib.Path(__file__).resolve().parent / "vectors"


def load_suite(name):
    """Yield (case_name, parsed_json) for every vector in a suite dir."""
    suite = VECTOR_DIR / name
    for path in sorted(suite.glob("*.json")):
        with open(path) as f:
            yield path.stem, json.load(f)


def unhex(s):
    if s.startswith("0x"):
        s = s[2:]
    return bytes.fromhex(s)
