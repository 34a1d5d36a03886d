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


def _current_round():
    """Round number the driver last recorded (None when unknown)."""
    p = os.path.join(ROOT, "PROGRESS.jsonl")
    if not os.path.exists(p):
        return None
    rounds = []
    with open(p) as f:
        for line in f:
            try:
                rounds.append(json.loads(line).get("round"))
            except (ValueError, AttributeError):
                continue
    rounds = [r for r in rounds if isinstance(r, int)]
    return max(rounds) if rounds else None


class TestBenchMfuGate:
    def _latest_bench(self):
        paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if not paths:
            pytest.skip("no BENCH_r*.json committed")
        with open(paths[-1]) as f:
            artifact = json.load(f)
        parsed = artifact.get("parsed", artifact)
        if parsed is None:
            # The driver captured no JSON (rc!=0 / timeout). A current-round
            # null is a loud failure; a previous round's null is superseded
            # by this round's pending run and must not redden the tier
            # (VERDICT r4 weak #3).
            m = re.search(r"BENCH_r0*(\d+)", os.path.basename(paths[-1]))
            artifact_round = int(m.group(1)) if m else None
            current = _current_round()
            msg = (
                f"{os.path.basename(paths[-1])} recorded no result "
                f"(parsed=null, rc={artifact.get('rc')}): bench.py timed "
                "out or crashed under the driver budget"
            )
            if current is not None and artifact_round is not None \
                    and artifact_round < current:
                pytest.skip(msg + " — stale artifact from a previous round,"
                            " awaiting this round's bench run")
            pytest.fail(msg)
        return parsed

    def test_latest_bench_not_regressed(self):
        parsed = self._latest_bench()
        if "encoder_pct_of_sustained" not in parsed:
            pytest.skip("bench artifact predates the MFU gate or ran in "
                        "degraded (budget-guard) mode without a stage split")
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
