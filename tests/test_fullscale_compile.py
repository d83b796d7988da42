"""Sharded AOT compile evidence at reduced-but-still-sharded scale
(default tier; the flagship 1.3B artifact is benchmark/FULLSCALE_COMPILE.json,
produced by the same `build_reports` code path at full shape).

Pins: abstract lowering+compile of (1) the data-parallel N-chunk second-pass
program and (2) the view-sharded large-T scan on the virtual 8-device mesh,
per-device memory analysis, and collective placement (the view-sharded
joint attention must lower to ICI collectives; independent DP chunks must
not ring-permute)."""

import pytest

from stable_virtual_camera_tpu.config import SevaSpec


@pytest.fixture(scope="module")
def reports():
    from benchmark.fullscale_compile import build_reports

    return build_reports(
        spec=SevaSpec.tiny(), hw=(64, 64), T_chunk=3, T_large=16,
        steps=2, n_dp=8, n_view=8,
    )


def test_programs_compile_and_fit(reports):
    assert len(reports) == 2
    for r in reports:
        assert r["compile_s"] > 0
        assert r["per_device_weights_io_gb"] < 16.0
        assert r["weights_io_fit_v5e_hbm"]


def test_view_sharded_uses_ici_collectives(reports):
    view = next(r for r in reports if r["program"].startswith("view"))
    assert view["collectives"], "view-sharded scan lowered to no collectives"
    assert any(
        op in view["collectives"]
        for op in ("collective-permute", "all-gather", "all-to-all")
    ), view["collectives"]


def test_dp_chunks_do_not_permute(reports):
    dp = next(r for r in reports if r["program"].startswith("dp"))
    # independent chunks: no ring/all-to-all traffic between device groups
    assert "collective-permute" not in dp["collectives"], dp["collectives"]
    assert "all-to-all" not in dp["collectives"], dp["collectives"]
