"""MFU / stage-split regression gate over the committed perf artifacts
(VERDICT r3 #9): bench.py emits `encoder_pct_of_sustained` judged against
ROOFLINE.json; these tests keep the committed artifacts self-consistent so a
round can't silently regress encode MFU or ship a contradictory roofline.
"""
import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    p = os.path.join(ROOT, name)
    if not os.path.exists(p):
        pytest.skip(f"{name} not committed")
    with open(p) as f:
        return json.load(f)


class TestRooflineArtifact:
    def test_encoder_pct_is_consistent(self):
        roofline = _load("ROOFLINE.json")
        enc = roofline["encoder_vit_h"]
        expect = 100 * enc["floor_ms_at_sustained_matmul"] / enc["measured_ms_per_frame"]
        assert enc["pct_of_sustained_matmul"] == pytest.approx(expect, rel=0.02)

    def test_floor_matches_analytic_flops(self):
        roofline = _load("ROOFLINE.json")
        enc = roofline["encoder_vit_h"]
        from scripts.microbench import vit_matmul_flops_per_frame

        flops = vit_matmul_flops_per_frame("vit_h")
        assert enc["matmul_flops_per_frame"] == pytest.approx(flops, rel=1e-6)
        floor = 1000 * flops / (roofline["matmul_bf16_tflops"] * 1e12)
        assert enc["floor_ms_at_sustained_matmul"] == pytest.approx(
            floor, abs=0.02
        )


class TestBenchMfuGate:
    def _latest_bench(self):
        paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if not paths:
            pytest.skip("no BENCH_r*.json committed")
        with open(paths[-1]) as f:
            return json.load(f)

    def test_latest_bench_not_regressed(self):
        bench = self._latest_bench()
        parsed = bench.get("parsed", bench)
        if "encoder_pct_of_sustained" not in parsed:
            pytest.skip("bench artifact predates the MFU gate")
        assert parsed.get("mfu_regression") is False
        roofline = _load("ROOFLINE.json")
        committed = roofline["encoder_vit_h"]["pct_of_sustained_matmul"]
        assert parsed["encoder_pct_of_sustained"] >= 0.9 * committed

    def test_encoder_mfu_helper_roundtrips(self):
        """bench.encoder_mfu over ROOFLINE.json's own stage split must
        reproduce the roofline's committed pct (same formula, same data)."""
        roofline = _load("ROOFLINE.json")
        import bench

        pct, regression = bench.encoder_mfu(roofline["stages_70f_3m_s"])
        assert pct == pytest.approx(
            roofline["encoder_vit_h"]["pct_of_sustained_matmul"], rel=0.02
        )
        assert regression is False
