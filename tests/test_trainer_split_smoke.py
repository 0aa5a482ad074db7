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
@pytest.mark.parametrize(
    "variant_flags",
    [
        [],  # default: non-LoRA, accum 1 — batch 1 on the 8-dev conftest
        # LoRA exercises the *extra pass-through into grad_jit and the
        # LoRA-shaped state/grads through the donating update program;
        # accum 2 adds the MultiSteps interaction on the split path
        ["--enable_lora", "--gradient_accumulation_steps", "2"],
    ],
    ids=["default", "lora-accum2"],
)
def test_trainer_runs_with_split_step(tmp_path, variant_flags):
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
        *variant_flags,
    ])
    assert cfg.split_train_step is True
    state = tvd.main(cfg)
    assert int(state.step) == 2
    # the final export ran (same artifact layout as the monolithic path)
    assert os.path.isdir(os.path.join(str(tmp_path), "pipeline"))


def test_train_mesh_clamps_to_batch():
    """Default mesh must not over-shard a small global batch (the r4 red
    test's root cause: batch 1 on an 8-device default mesh crashed
    device_put). Runs on the 8-virtual-device conftest CPU mesh."""
    from ctrlv_tpu.parallel import make_train_mesh

    assert make_train_mesh(1).shape["data"] == 1
    assert make_train_mesh(2).shape["data"] == 2
    # largest batch divisor that fits, NOT gcd(devices, batch): a batch-3
    # run on 8 devices must use 3 of them (gcd would under-shard to 1)
    assert make_train_mesh(3).shape["data"] == 3
    assert make_train_mesh(5).shape["data"] == 5
    assert make_train_mesh(6).shape["data"] == 6
    assert make_train_mesh(7).shape["data"] == 7
    assert make_train_mesh(8).shape["data"] == 8
    assert make_train_mesh(16).shape["data"] == 8
    # batch 9 on 8 devices: 9's largest divisor <= 8 is 3
    assert make_train_mesh(9).shape["data"] == 3
    assert make_train_mesh(4, n_frame=2).shape == {"data": 4, "frame": 2}
    # frame axis halves the device budget for data: batch 6, frame 2 ->
    # 4 devices available per frame-shard, largest divisor of 6 that fits is 3
    assert make_train_mesh(6, n_frame=2).shape == {"data": 3, "frame": 2}
    with pytest.raises(ValueError, match="does not divide"):
        make_train_mesh(3, n_data=2)
    # explicit divisor is honored
    assert make_train_mesh(4, n_data=2).shape["data"] == 2
