"""Analytic roofline model (utils/roofline.py): internal consistency and
the invariants the bench JSON relies on."""
import numpy as np

from curriculum_learning_for_vln_tpu.utils.roofline import (
    Cost, EnvDropShapes, decoder_step_cost, encoder_cost, matmul, n_params,
    roofline_summary, rollout_cost, train_iter_cost)


def test_matmul_cost():
    c = matmul(4, 8, 16, w_bytes=2)
    assert c.flops == 2 * 4 * 8 * 16
    assert c.bytes == 8 * 16 * 2


def test_cost_algebra():
    a, b = Cost(1.0, 2.0), Cost(3.0, 4.0)
    s = a + b
    assert (s.flops, s.bytes) == (4.0, 6.0)
    d = 3 * a
    assert (d.flops, d.bytes) == (3.0, 6.0)


def test_shapes_and_params():
    s = EnvDropShapes()
    assert s.F == s.D + s.A
    # production agent is ~13M matmul params (BASELINE.md)
    assert 10e6 < n_params(s) < 20e6


def test_rollout_scales_with_T():
    s = EnvDropShapes()
    c10, c35 = rollout_cost(s, 10), rollout_cost(s, 35)
    step = decoder_step_cost(s)
    np.testing.assert_allclose(c35.flops - c10.flops, 25 * step.flops)
    # weight stream counted once regardless of T (scan-resident weights)
    np.testing.assert_allclose(c35.bytes - c10.bytes, 25 * step.bytes)


def test_train_iter_exceeds_forward():
    s = EnvDropShapes()
    t = train_iter_cost(s, il_T=8)
    assert t["flops"] > 2.9 * t["fwd_flops"]  # bwd = 2x fwd + optimizer
    assert t["bytes"] > t["fwd_bytes"]


def test_summary_fields_tpu():
    s = EnvDropShapes()
    rc = rollout_cost(s)
    out = roofline_summary(rc.flops, rc.bytes, measured_s=1.5e-3,
                           platform="tpu")
    for k in ("model_gflops", "min_hbm_gbytes", "achieved_tflops",
              "pct_peak_mxu_bf16", "pct_hbm_roofline", "roofline_floor_ms",
              "x_over_floor", "roofline_bound"):
        assert k in out, k
    assert out["roofline_bound"] in ("hbm", "mxu")
    # measured slower than floor -> x_over_floor > 1; and floor time is
    # consistent with the bound percentages
    assert out["x_over_floor"] >= 1.0
    floor_s = out["roofline_floor_ms"] / 1e3
    np.testing.assert_allclose(out["x_over_floor"], 1.5e-3 / floor_s,
                               rtol=0.02)


def test_summary_cpu_has_no_tpu_fields():
    s = EnvDropShapes()
    rc = rollout_cost(s)
    out = roofline_summary(rc.flops, rc.bytes, 1.0, platform="cpu")
    assert "pct_peak_mxu_bf16" not in out
    assert "model_gflops" in out
