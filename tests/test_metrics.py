"""Metrics logger tests."""

from symmetry_ode_discovery_tpu.utils.metrics import MetricsLogger, load_metrics


def test_metrics_roundtrip(tmp_path):
    lg = MetricsLogger("testrun", config={"lr": 1e-3, "task": "dosc"},
                       root=str(tmp_path))
    lg.log({"loss": 1.5, "acc": 0.5})
    lg.log({"loss": 1.0}, step=5)
    lg.finish()
    recs = load_metrics("testrun", root=str(tmp_path))
    assert recs[0]["loss"] == 1.5 and recs[0]["step"] == 0
    assert recs[1]["loss"] == 1.0 and recs[1]["step"] == 5
    import json, os

    params = json.load(open(os.path.join(str(tmp_path), "testrun", "params.json")))
    assert params["task"] == "dosc"
