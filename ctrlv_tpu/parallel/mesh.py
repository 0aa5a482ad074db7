"""Device mesh construction for Ctrl-V TPU workloads.

The reference's distributed story is NCCL data-parallel via HF Accelerate
plus a manual 2-GPU model split (SURVEY.md §2.9). The TPU-native design
replaces all of it with one jax.sharding.Mesh and sharding annotations:

  - axis "data": data-parallel (training batches / eval candidates),
  - axis "frame": sequence-parallel over the CFG*batch*frame axis of video
    latents during sampling (spatial convs/attention are embarrassingly
    parallel per frame; the 25-token temporal attention all-gathers over
    ICI, which is cheap at this length — SURVEY.md §5 long-context row).

XLA inserts the psum/all-gather collectives from the shardings; there is no
NCCL analog to manage.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    frame: str = "frame"


AXES = MeshAxes()


def make_mesh(
    n_data: Optional[int] = None,
    n_frame: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, frame) mesh over the available devices.

    Defaults to all devices on the data axis (pure DP). For sampling-heavy
    eval, put devices on the frame axis instead (frame-sharded latents).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_frame
    assert n_data * n_frame == len(devices), (
        f"mesh {n_data}x{n_frame} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_frame)
    return Mesh(arr, (AXES.data, AXES.frame))
