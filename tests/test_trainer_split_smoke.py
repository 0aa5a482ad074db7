"""End-to-end trainer smoke for the two-program split step
(--split_train_step): the CLI path that makes FULL-UNet finetune compile
where the monolithic fwd+bwd+optimizer program exceeds a host's AOT
compile-size ceiling (PERF.md round-4; reference full-finetune regime:
train_video_diffusion.py:202-212).

Numerical split==monolith parity lives in
tests/test_train.py::test_split_grad_update_matches_monolithic; this test
covers the tools/train_video_diffusion.py wiring (config flag -> routed
step_fn -> loss/grad_norm metrics -> final pipeline export)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.mark.mesh
def test_trainer_runs_with_split_step(tmp_path):
    import train_video_diffusion as tvd
    from ctrlv_tpu.utils.config import parse_args

    cfg = parse_args([
        "--dataset_name", "synthetic",
        "--output_dir", str(tmp_path),
        "--max_train_steps", "2",
        "--validation_steps", "0",
        "--checkpointing_steps", "1000",
        "--clip_length", "3",
        "--train_H", "64",
        "--train_W", "64",
        "--split_train_step",
    ])
    assert cfg.split_train_step is True
    state = tvd.main(cfg)
    assert int(state.step) == 2
    # the final export ran (same artifact layout as the monolithic path)
    assert os.path.isdir(os.path.join(str(tmp_path), "pipeline"))
