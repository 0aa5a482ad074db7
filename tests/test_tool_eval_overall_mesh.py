"""Tool-level mesh smoke: `tools/eval_overall.py` on a (4x2) virtual mesh
(VERDICT r2 missing #4 'Done' condition — the two-stage eval driver, not
just the pipeline class, must run sharded end-to-end)."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

pytestmark = [pytest.mark.mesh]


def test_eval_overall_tool_on_mesh(tmp_path):
    from eval_overall import main

    from ctrlv_tpu.utils.config import Config

    cfg = Config(
        dataset_name="synthetic",
        data_root=str(tmp_path),
        clip_length=4,
        train_H=32,
        train_W=32,
        num_inference_steps=2,
        decode_chunk_size=4,
        output_dir=str(tmp_path / "out"),
        mesh_data=4,
        mesh_frame=2,
        num_demo_samples=1,
    )
    summary = main(cfg, max_samples=1)
    assert set(summary) >= {"miou", "ap", "ar"}
    for mean, _std in summary.values():
        assert 0.0 <= mean <= 1.0
    assert os.path.exists(tmp_path / "out" / "generated_video_0.gif")
