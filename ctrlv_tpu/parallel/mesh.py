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
import math
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


def make_train_mesh(
    global_batch: int,
    n_data: Optional[int] = None,
    n_frame: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Training mesh whose data axis always divides the global batch.

    The reference's envelope is batch 1 (demo_train_video_box2video.sh), so
    on a multi-device host a default all-devices DP mesh cannot shard the
    batch at all — `device_put(batch, P("data"))` raises on divisibility.
    With `n_data=None` this picks the LARGEST divisor of the batch that
    fits the available devices (the mesh need not use every device —
    make_mesh takes a device slice), leaving the surplus idle, which is
    the only semantics-preserving option short of padding the batch with
    dead samples. gcd(avail, batch) would under-shard whenever a larger
    batch divisor fits: batch 6 on 8 devices must run data=6, not
    gcd=2 with six devices idle. An explicit `n_data` that doesn't divide
    the batch is a clear error instead of a shape crash deep inside
    device_put.
    """
    devices = list(devices if devices is not None else jax.devices())
    avail = max(len(devices) // max(n_frame, 1), 1)
    if n_data is None:
        b = max(int(global_batch), 1)
        n_data = max(d for d in range(1, min(avail, b) + 1) if b % d == 0)
    elif global_batch % n_data != 0:
        raise ValueError(
            f"--mesh_data {n_data} does not divide the global batch "
            f"{global_batch}; pick a divisor (or omit --mesh_data to "
            f"auto-select gcd(devices, batch))"
        )
    return make_mesh(n_data, n_frame, devices[: n_data * n_frame])
