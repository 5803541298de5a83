"""Fast unit tests for the one-process workflow runner's stage plumbing.

run_workflow PREDICTS the stage CLIs' output paths (it assembles each
stage's argv the way scripts/start_*.sh would); these tests pin the
prediction to the stage CLIs' own name derivations without running any
pipeline — the stage mains are monkeypatched to record their parsed args.
Regression: dotted filenames ("starry.night.png") must map to the same
directory name on both sides (basename().split('.')[0], NOT splitext).
"""

import os

import pytest

from univst_tpu.cli import run_workflow as wf


@pytest.fixture
def recorded(monkeypatch):
    import univst_tpu.cli.mask_propagation as mp
    import univst_tpu.cli.run_content_inversion_sd as ci
    import univst_tpu.cli.run_style_inversion_sd as si
    import univst_tpu.cli.run_video_style_transfer_sd as st

    calls = {}
    monkeypatch.setattr(ci, "main", lambda a: calls.__setitem__("content", a))
    monkeypatch.setattr(si, "main", lambda a: calls.__setitem__("style", a))
    monkeypatch.setattr(mp, "main", lambda a: calls.__setitem__("mask", a))
    monkeypatch.setattr(st, "main", lambda a: calls.__setitem__("transfer", a))
    return calls


def test_predicted_paths_match_stage_derivations(recorded, tmp_path):
    root = str(tmp_path)
    wf.main(wf.build_parser().parse_args([
        "--backbone", "sd",
        "--content_path", "contents/my.video.v2",
        "--style_path", "styles/starry.night.png",
        "--mask_path", "masks/obj.mask.png",
        "--output_root", root,
    ]))
    # the stage CLIs' own derivations (run_content_inversion_sd.py:37,
    # run_style_inversion_sd.py:43, mask_propagation.py:31)
    cname = os.path.basename(os.path.normpath("contents/my.video.v2")).split(".")[0]
    sname = os.path.basename("styles/starry.night.png").split(".")[0]
    mname = os.path.basename("masks/obj.mask.png").split(".")[0]
    t = recorded["transfer"]
    assert t.content_inv_path == f"{root}/contents-inv/sd/{cname}/inversion"
    assert t.style_inv_path == f"{root}/styles-inv/sd/{sname}/inversion"
    assert t.mask_path == f"{root}/masks/sd/{mname}"
    # the mask stage reads the feature file where the content stage wrote it
    m = recorded["mask"]
    a = recorded["content"]
    assert m.feature_path == (
        f"{root}/contents-inv/sd/{cname}/features/"
        f"inversion_feature_map_{a.ft_indices}_block_{a.ft_timesteps}_step.pt"
    )


def test_ft_flags_forward_to_content_and_mask(recorded, tmp_path):
    root = str(tmp_path)
    wf.main(wf.build_parser().parse_args([
        "--backbone", "sd", "--output_root", root,
        "--ft_indices", "1", "--ft_timesteps", "201",
    ]))
    assert recorded["content"].ft_indices == 1
    assert recorded["content"].ft_timesteps == 201
    assert "inversion_feature_map_1_block_201_step.pt" in recorded["mask"].feature_path


def test_ft_flags_used_when_content_stage_skipped(recorded, tmp_path):
    root = str(tmp_path)
    wf.main(wf.build_parser().parse_args([
        "--backbone", "sd", "--output_root", root,
        "--stages", "mask", "--ft_indices", "1", "--ft_timesteps", "201",
    ]))
    assert "content" not in recorded
    assert "inversion_feature_map_1_block_201_step.pt" in recorded["mask"].feature_path


def test_unknown_stage_rejected(recorded):
    with pytest.raises(SystemExit, match="tranfer"):
        wf.main(wf.build_parser().parse_args(["--stages", "tranfer"]))
    assert not recorded
