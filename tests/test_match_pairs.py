"""Smoke test for the standalone SuperGlue match_pairs CLI
(reference sam_pt/point_tracker/superglue/match_pairs.py surface)."""
import numpy as np
import pytest


@pytest.mark.slow
def test_match_pairs_cli(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from sam_pt_tpu.models.tracker.superglue.match_pairs import main

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    base = (rng.uniform(0, 255, size=(120, 160))).astype(np.uint8)
    cv2.imwrite(str(img_dir / "a.png"), base)
    cv2.imwrite(str(img_dir / "b.png"), np.roll(base, 3, axis=1))

    # identity relative pose + simple intrinsics for the --eval row
    K = [100.0, 0, 80, 0, 100, 60, 0, 0, 1]
    T = list(np.eye(4).ravel())
    row = ["a.png", "b.png", "0", "0"] + [str(x) for x in K + K + T]
    pairs = tmp_path / "pairs.txt"
    pairs.write_text(" ".join(row) + "\n")

    out_dir = tmp_path / "out"
    main([
        "--input_pairs", str(pairs),
        "--input_dir", str(img_dir),
        "--output_dir", str(out_dir),
        "--resize", "160", "120",
        "--max_keypoints", "64",
        "--sinkhorn_iterations", "5",
        "--allow_random_init",
        "--eval", "--viz",
    ])
    m = np.load(out_dir / "a_b_matches.npz")
    assert set(m) == {"keypoints0", "keypoints1", "matches",
                      "match_confidence"}
    assert m["matches"].shape == m["match_confidence"].shape
    e = np.load(out_dir / "a_b_evaluation.npz")
    assert {"error_R", "error_t", "precision", "matching_score",
            "num_correct", "epipolar_errors"} <= set(e)
    assert (out_dir / "a_b_matches.png").exists()

    # --cache must reuse the saved npz without re-matching
    main([
        "--input_pairs", str(pairs),
        "--input_dir", str(img_dir),
        "--output_dir", str(out_dir),
        "--resize", "160", "120",
        "--allow_random_init", "--cache",
    ])
