"""tools/noise_curve.py protocol table must match run_configs/ verbatim.

The noise-curve tool hard-codes each (system, method) protocol (it sweeps the
SAME protocol across noise levels, so it can't read a per-level cfg). This
test parses the actual run_configs files and asserts the tool's table agrees
— protocol drift between the experiment harness and the curve evidence fails
loudly.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from symmetry_ode_discovery_tpu.utils.config import get_args  # noqa: E402

from tools.noise_curve import make_protocol  # noqa: E402

CFGS = {
    ("dosc", "sindy"): "dosc/noise20_sindy.cfg",
    ("dosc", "esindy"): "dosc/noise20_esindy.cfg",
    ("growth", "sindy"): "growth/noise05_sindy.cfg",
    ("growth", "esindy"): "growth/noise05_esindy.cfg",
    ("lv", "sindy"): "lv/noise99_eq_sindy_2.cfg",
    ("selkov", "sindy"): "selkov/noise20_eq_sindy.cfg",
    ("dosc", "wsindy"): "dosc/noise20_wsindy.cfg",
    ("growth", "wsindy"): "growth/noise05_wsindy.cfg",
    ("lv", "wsindy"): "lv/noise99_eq_wsindy.cfg",
    ("selkov", "wsindy"): "selkov/noise20_eq_wsindy.cfg",
}


@pytest.mark.parametrize("system,method", sorted(CFGS))
def test_protocol_matches_run_config(system, method):
    args = vars(get_args(["--config", CFGS[(system, method)]]))
    cfg_kw, hp_kw, subsample = make_protocol(system, method)

    assert cfg_kw.get("poly_order", 2) == args["poly_order"]
    assert cfg_kw.get("include_exp", False) == args["include_exp"]
    assert float(cfg_kw["threshold"]) == float(args["threshold"])
    assert cfg_kw.get("constrain_constant", False) == args["constrain_constant"]
    assert ("L_list" in cfg_kw) == args["eq_constraint"]

    if method == "wsindy":
        assert subsample is None
        assert hp_kw["w_sindy_reg"] == args["w_sindy_reg"]
        assert float(hp_kw["threshold"]) == float(args["threshold"])
    else:
        assert subsample == args["lbfgs_subsample"]
        assert hp_kw["num_epochs"] == args["num_epochs"]
        assert hp_kw["lr_sindy"] == args["lr_sindy"]
        assert hp_kw["st_freq"] == args["st_freq"]
        assert float(hp_kw["threshold"]) == float(args["threshold"])
