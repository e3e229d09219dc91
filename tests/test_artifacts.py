"""Benchmark artifact contracts: bench.py must embed the committed
weak-scaling and roofline records so the driver's BENCH_r{N}.json carries
them (VERDICT r3 missing #1 — SCALING.json existed as code but was never
generated; this pins both the artifact and the embedding)."""

import importlib.util
import os
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaling_record_embedded():
    rec = _bench()._embed("SCALING.json")
    assert rec is not None, "SCALING.json must be committed (tools/bench_scaling.py)"
    assert rec["metric"] == "weak_scaling"
    eff = rec["verify_efficiency"]
    assert set(eff) >= {"1", "2", "4", "8"}
    assert eff["1"] == 1.0


def test_roofline_record_embedded():
    rec = _bench()._embed("ROOFLINE.json")
    assert rec is not None, "ROOFLINE.json must be committed (tools/gen_roofline.py)"
    assert rec["fpmul_per_verify"] > 0
    assert rec["ladders"] == "static"
