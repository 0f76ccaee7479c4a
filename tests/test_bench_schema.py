"""bench.py's stdout contract: exactly one JSON line with the driver
schema plus the in-artifact physics context (round-3 VERDICT weak #3 /
item 7). The payload builder is unit-tested so the schema cannot drift
without a test edit; the TPU run itself is exercised by the driver."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_payload_schema(tmp_path):
    bench = _load_bench()
    all_path = tmp_path / "BENCH_ALL.json"
    all_path.write_text(json.dumps({
        "regimes": {"spark": 388.0, "moco_fast": 916.1, "moco": 461.0}}))
    p = bench._headline_payload(387.97, bench_all_path=str(all_path))
    # driver-required fields, unchanged semantics
    assert p["metric"] == "spark_pretrain_throughput"
    assert p["value"] == 387.97
    assert p["unit"] == "images/sec/chip"
    assert p["vs_baseline"] == round(387.97 / 1250.0, 4)
    # physics-context fields (in-artifact ceiling case)
    assert p["vs_dense_ceiling"] == round(387.97 / 693.0, 4)
    assert p["dense_ceiling_img_s"] == 693.0
    assert p["moco_fast_img_s"] == 916.1
    assert p["fastest_regime"] == "moco_fast:916.1"
    # one-line contract: the payload is a single flat json-serializable dict
    line = json.dumps(p)
    assert "\n" not in line and json.loads(line) == p


def test_headline_payload_without_bench_all(tmp_path):
    bench = _load_bench()
    p = bench._headline_payload(100.0,
                                bench_all_path=str(tmp_path / "missing.json"))
    assert "moco_fast_img_s" not in p and "fastest_regime" not in p
    assert p["vs_dense_ceiling"] == round(100.0 / 693.0, 4)
