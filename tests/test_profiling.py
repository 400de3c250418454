"""StepTimer telemetry math (utils/profiling.py): the perf/* scalars the
runner logs every `window` steps."""

import numpy as np

from melspec_gpt_vqvae_tpu.utils.profiling import (StepTimer, count_params,
                                                   gpt_fwd_flops)


def test_steptimer_reports_at_window():
    t = StepTimer(window=3, tokens_per_example=10,
                  flops_per_step=1e12, n_devices=1)
    assert t.tick(4) is None
    assert t.tick(4) is None
    out = t.tick(4)
    assert out is not None
    assert set(out) == {"perf/steps_per_sec", "perf/examples_per_sec",
                        "perf/tokens_per_sec", "perf/mfu_pct"}
    # 12 examples x 10 tokens over dt; ratio to steps/sec is exact
    assert np.isclose(out["perf/tokens_per_sec"],
                      out["perf/examples_per_sec"] * 10)


def test_steptimer_mfu_divides_by_device_count():
    """flops_per_step covers the GLOBAL batch, so MFU must divide by the
    peak of every device carrying it — an 8-device mesh reports 1/8th the
    single-chip number for the same wall time (regression: the original
    formula overstated multi-device MFU N-fold)."""
    def mfu(n_dev):
        t = StepTimer(window=1, flops_per_step=1e12, n_devices=n_dev)
        t.t0 -= 1.0     # pretend the step took >= 1 s
        return t.tick(1)["perf/mfu_pct"]

    one, eight = mfu(1), mfu(8)
    assert 7.0 < one / eight < 9.0


def test_flop_and_param_helpers():
    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros((4,))}}
    assert count_params(params) == 10
    # 2*P*B*T matmul term + 4*L*B*T^2*D attention term
    assert gpt_fwd_flops(100, 2, 3, 1, 5) == 2 * 100 * 2 * 3 + 4 * 2 * 9 * 5
